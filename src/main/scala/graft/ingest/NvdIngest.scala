package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.AdvisoryRow

/** NVD 2.0 API feed ingestion (SURVEY S2; reference importers/nvd.py and
  * pipelines/v2_importers/nvd_importer.py semantics): one CVE item per
  * JSON row → AdvisoryRow with CVSS severities and reference
  * classification. CPE applicability statements are carried as references
  * (`cpe:...` reference ids) the CPE lookup (J14) serves from.
  */
object NvdIngest {

  val cveSchema: StructType = StructType.fromDDL(
    """cve STRUCT<
      |  id: STRING, published: STRING, lastModified: STRING,
      |  descriptions: ARRAY<STRUCT<lang: STRING, value: STRING>>,
      |  metrics: STRUCT<
      |    cvssMetricV31: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING>>>,
      |    cvssMetricV2: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING>>>>,
      |  references: ARRAY<STRUCT<url: STRING, tags: ARRAY<STRING>>>,
      |  configurations: ARRAY<STRUCT<nodes: ARRAY<STRUCT<
      |    cpeMatch: ARRAY<STRUCT<criteria: STRING, vulnerable: BOOLEAN>>>>>>
      |>""".stripMargin)

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("item", from_json(col("json"), cveSchema))
      .select(col("datasource_id"), col("item.cve").as("cve"))
    o.select(
      col("datasource_id"),
      col("cve.id").as("advisory_id"),
      coalesce(expr(
        "filter(cve.descriptions, d -> d.lang = 'en')[0].value"),
        lit("")).as("summary"),
      array(col("cve.id")).as("aliases"),
      concat(
        expr("""transform(coalesce(cve.references,
               |  array()), r -> struct(
               |  r.url AS url,
               |  CASE WHEN array_contains(r.tags, 'Exploit') THEN 'exploit'
               |       WHEN array_contains(r.tags, 'Vendor Advisory')
               |         THEN 'advisory'
               |       WHEN array_contains(r.tags, 'Issue Tracking') THEN 'bug'
               |       ELSE 'other' END AS reference_type,
               |  regexp_extract(r.url, '[^/]+$', 0) AS reference_id))"""
          .stripMargin),
        expr("""transform(flatten(transform(coalesce(cve.configurations,
               |  array()), c -> flatten(transform(c.nodes,
               |    n -> filter(n.cpeMatch, m -> m.vulnerable))))),
               |  m -> struct('' AS url, 'other' AS reference_type,
               |              m.criteria AS reference_id))""".stripMargin))
        .as("references"),
      concat(
        expr("""transform(coalesce(cve.metrics.cvssMetricV31, array()),
               |  m -> struct('cvssv3.1' AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    '' AS url))""".stripMargin),
        expr("""transform(coalesce(cve.metrics.cvssMetricV2, array()),
               |  m -> struct('cvssv2' AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    '' AS url))""".stripMargin)).as("severities"),
      array().cast("array<int>").as("weaknesses"),
      expr("array()").cast(
        "array<struct<purl:string,affecting_vers:string,fixed_vers:string>>")
        .as("affected"),
      coalesce(to_timestamp(col("cve.lastModified")),
        to_timestamp(col("cve.published")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("cve.published")).as("date_published"),
      concat(lit("https://nvd.nist.gov/vuln/detail/"), col("cve.id"))
        .as("url"),
      lit(10).as("precedence")) // NVD is a high-precedence source
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }
}
