package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Node.js security-wg advisories ingestion (S2): one JSON per advisory
  * under vuln/npm with npm-native version ranges
  * (pipelines/v2_importers/npm_importer.py:63-167). Range strings reuse
  * the gitlab-native operator translation (same `||` + comparator
  * grammar). */
object NodeSecurityIngest {

  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("overview", StringType),
    StructField("created_at", StringType),
    StructField("cvss_vector", StringType),
    StructField("cvss_score", StringType),
    StructField("module_name", StringType),
    StructField("vulnerable_versions", StringType),
    StructField("patched_versions", StringType),
    StructField("cves", ArrayType(StringType)),
    StructField("references", ArrayType(StringType))))

  private val rangeUdf = udf((range: String) =>
    Option(range).map(_.trim).filter(_.nonEmpty)
      .map {
        case "*" => "*"
        case r => GitlabIngest.rangeConstraints(r).mkString("|")
      }
      .getOrElse(""))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 500): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("d", from_json(col("json"), schema))
      .select(col("datasource_id"), col("d.*"))
      .filter(col("id").isNotNull)

    val advUrl = concat(
      lit("https://github.com/nodejs/security-wg/blob/main/vuln/npm/"),
      col("id"), lit(".json"))
    val sevs = filter(array(
      when(col("cvss_vector").startsWith("CVSS:3.0/"), struct(
        lit("cvssv3").as("scoring_system"),
        col("cvss_score").as("value"),
        col("cvss_vector").as("scoring_elements"), advUrl.as("url"))),
      when(col("cvss_vector").startsWith("CVSS:2.0/"), struct(
        lit("cvssv2").as("scoring_system"),
        col("cvss_score").as("value"),
        col("cvss_vector").as("scoring_elements"), advUrl.as("url")))),
      s => s.isNotNull)
    // plain references carry no id (npm_importer.py:114-119); only the
    // advisory self-reference does
    val refs = concat(
      transform(coalesce(col("references"), array().cast("array<string>")),
        r => struct(r.as("url"), lit("other").as("reference_type"),
          lit("").as("reference_id"))),
      array(struct(advUrl.as("url"), lit("advisory").as("reference_type"),
        col("id").as("reference_id"))))

    // sentinel ranges per npm_importer.py:150-157
    val vulnRange = when(col("vulnerable_versions") === "<=99.999.99999",
      lit("*")).otherwise(col("vulnerable_versions"))
    val patchedRange = when(col("patched_versions") === "<0.0.0",
      lit(null).cast("string")).otherwise(col("patched_versions"))

    val affected = filter(array(
      when(col("module_name").isNotNull, struct(
        concat(lit("pkg:npm/"), col("module_name")).as("purl"),
        concat(lit("vers:semver/"), rangeUdf(vulnRange))
          .as("affecting_vers"),
        concat(lit("vers:semver/"), rangeUdf(patchedRange))
          .as("fixed_vers")))), p => p.isNotNull)

    o.select(
      col("datasource_id"),
      concat(lit("npm-"), col("id")).as("advisory_id"),
      // build_description(title, overview) (npm_importer.py:133)
      when(trim(coalesce(col("overview"), lit(""))) === "",
        trim(coalesce(col("title"), lit(""))))
        .when(trim(coalesce(col("title"), lit(""))) =!= "" &&
          !trim(coalesce(col("overview"), lit("")))
            .contains(trim(coalesce(col("title"), lit("")))),
          concat(trim(col("title")), lit("\n"),
            trim(coalesce(col("overview"), lit("")))))
        .otherwise(trim(coalesce(col("overview"), lit(""))))
        .as("summary"),
      coalesce(col("cves"), array().cast("array<string>")).as("aliases"),
      refs.as("references"),
      sevs.as("severities"),
      array().cast("array<int>").as("weaknesses"),
      affected.as("affected"),
      coalesce(to_timestamp(col("created_at")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("created_at")).as("date_published"),
      advUrl.as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
