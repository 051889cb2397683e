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
      |    cvssMetricV40: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING, version: STRING>>>,
      |    cvssMetricV31: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING, version: STRING>>>,
      |    cvssMetricV30: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING, version: STRING>>>,
      |    cvssMetricV2: ARRAY<STRUCT<cvssData: STRUCT<baseScore: DOUBLE,
      |      vectorString: STRING, version: STRING>>>>,
      |  references: ARRAY<STRUCT<url: STRING, tags: ARRAY<STRING>>>,
      |  weaknesses: ARRAY<STRUCT<description: ARRAY<STRUCT<
      |    lang: STRING, value: STRING>>>>,
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
      // the CVE id is the advisory id, never a self-alias
      // (nvd_importer.py:313 aliases=[])
      array().cast("array<string>").as("aliases"),
      concat(
        // every CPE (vulnerable or not, nvd_importer.py:195-202) as an
        // NVD-search reference, the reference's own tracking shape
        expr("""transform(array_distinct(flatten(transform(
               |  coalesce(cve.configurations, array()),
               |  c -> flatten(transform(c.nodes,
               |    n -> transform(coalesce(n.cpeMatch, array()),
               |      m -> m.criteria)))))),
               |  cpe -> struct(
               |  concat('https://nvd.nist.gov/vuln/search/results',
               |    '?adv_search=true&isCpeNameSearch=true&query=', cpe)
               |    AS url,
               |  'other' AS reference_type,
               |  cpe AS reference_id))""".stripMargin),
        // the CVE proper as a reference (nvd_importer.py:265-271)
        expr("""array(struct(
               |  concat('https://nvd.nist.gov/vuln/detail/', cve.id) AS url,
               |  'advisory' AS reference_type,
               |  cve.id AS reference_id))""".stripMargin),
        // tag-based typing kept as richer-than-reference data (the v2
        // pipeline drops tags, nvd_importer.py:243 FIXME); ids stay
        // empty like the reference's ReferenceV2(url=...)
        expr("""array_distinct(transform(coalesce(cve.references,
               |  array()), r -> struct(
               |  r.url AS url,
               |  CASE WHEN array_contains(r.tags, 'Exploit') THEN 'exploit'
               |       WHEN array_contains(r.tags, 'Vendor Advisory')
               |         THEN 'advisory'
               |       WHEN array_contains(r.tags, 'Issue Tracking') THEN 'bug'
               |       ELSE 'other' END AS reference_type,
               |  '' AS reference_id)))""".stripMargin))
        .as("references"),
      concat(
        expr("""transform(coalesce(cve.metrics.cvssMetricV40, array()),
               |  m -> struct('cvssv4' AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    concat('https://nvd.nist.gov/vuln/detail/', cve.id)
               |      AS url))""".stripMargin),
        expr("""transform(coalesce(cve.metrics.cvssMetricV31, array()),
               |  m -> struct(
               |    CASE WHEN m.cvssData.version = '3.1' THEN 'cvssv3.1'
               |         ELSE 'cvssv3' END AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    concat('https://nvd.nist.gov/vuln/detail/', cve.id)
               |      AS url))""".stripMargin),
        expr("""transform(coalesce(cve.metrics.cvssMetricV30, array()),
               |  m -> struct('cvssv3' AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    concat('https://nvd.nist.gov/vuln/detail/', cve.id)
               |      AS url))""".stripMargin),
        expr("""transform(coalesce(cve.metrics.cvssMetricV2, array()),
               |  m -> struct('cvssv2' AS scoring_system,
               |    CAST(m.cvssData.baseScore AS STRING) AS value,
               |    m.cvssData.vectorString AS scoring_elements,
               |    concat('https://nvd.nist.gov/vuln/detail/', cve.id)
               |      AS url))""".stripMargin)).as("severities"),
      expr("""filter(transform(flatten(transform(
             |  coalesce(cve.weaknesses, array()),
             |  w -> filter(coalesce(w.description, array()),
             |    d -> d.lang = 'en'))),
             |  d -> CAST(regexp_extract(d.value, 'CWE-(\\d+)', 1) AS INT)),
             |  x -> x IS NOT NULL)""".stripMargin).as("weaknesses"),
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
