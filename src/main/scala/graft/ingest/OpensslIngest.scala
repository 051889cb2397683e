package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** OpenSSL security advisories ingestion (S2): the project's secjson
  * CVE 5.x records (pipelines/v2_importers/openssl_importer.py:62-160,
  * pipes/openssl.py:22-99). Declarative `from_json`: per-version rows
  * translate (version, lessThan, lessThanOrEqual) into openssl-scheme
  * constraints, references classify commit/advisory by name and tag. */
object OpensslIngest {

  private val VersionRow = StructType(Seq(
    StructField("version", StringType),
    StructField("lessThan", StringType),
    StructField("lessThanOrEqual", StringType),
    StructField("status", StringType)))
  private val LangValue = StructType(Seq(
    StructField("lang", StringType),
    StructField("value", StringType)))
  private val RefRow = StructType(Seq(
    StructField("name", StringType),
    StructField("url", StringType),
    StructField("tags", ArrayType(StringType))))
  private val MetricRow = StructType(Seq(
    StructField("other", StructType(Seq(
      StructField("content", StructType(Seq(
        StructField("text", StringType)))))))))
  private val AffectedRowT = StructType(Seq(
    StructField("versions", ArrayType(VersionRow))))
  private val CnaType = StructType(Seq(
    StructField("title", StringType),
    StructField("datePublic", StringType),
    StructField("descriptions", ArrayType(LangValue)),
    StructField("metrics", ArrayType(MetricRow)),
    StructField("references", ArrayType(RefRow)),
    StructField("affected", ArrayType(AffectedRowT))))
  val schema: StructType = StructType(Seq(
    StructField("cveMetadata", StructType(Seq(
      StructField("cveId", StringType)))),
    StructField("containers", StructType(Seq(
      StructField("cna", CnaType))))))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("c", from_json(col("json"), schema))
      .select(col("datasource_id"),
        col("c.cveMetadata.cveId").as("cve"),
        col("c.containers.cna.*"))
      .filter(col("cve").isNotNull)

    val summary = coalesce(
      try_element_at(col("descriptions"), lit(1)).getField("value"),
      col("title"), lit(""))
    val sevText = try_element_at(col("metrics"), lit(1))
      .getField("other").getField("content").getField("text")
    val sevs = when(sevText.isNotNull, array(struct(
      lit("generic_textual").as("scoring_system"), sevText.as("value"),
      lit("").as("scoring_elements"), lit("").as("url"))))
      .otherwise(array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>"))

    val refs = transform(filter(coalesce(col("references"),
      array().cast(
        "array<struct<name:string,url:string,tags:array<string>>>")),
      r => r.getField("url").isNotNull), r => {
      val name = lower(coalesce(r.getField("name"), lit("")))
      val tag = lower(coalesce(try_element_at(coalesce(r.getField("tags"),
        array().cast("array<string>")), lit(1)), lit("")))
      struct(
        r.getField("url").as("url"),
        when(name.contains("commit") || tag === "patch", "commit")
          .when(name.contains("advisory"), "advisory")
          .otherwise("other").as("reference_type"),
        coalesce(r.getField("name"), tag).as("reference_id"))
    })

    // pipes/openssl.py:22-52: lessThan -> <x with fixed=x; lessThanOrEqual
    // -> <=x; the lower bound is = when alone, >= with an upper bound
    val versions = filter(flatten(transform(coalesce(col("affected"),
      array().cast(ArrayType(AffectedRowT))),
      a => coalesce(a.getField("versions"), array().cast(
        ArrayType(VersionRow))))),
      v => v.getField("status") === "affected" &&
        v.getField("version").isNotNull)
    val affected = transform(versions, v => {
      val lower = v.getField("version")
      val lt = v.getField("lessThan")
      val lte = v.getField("lessThanOrEqual")
      val cons =
        when(lt.isNotNull, concat(lit(">="), lower, lit("|<"), lt))
          .when(lte.isNotNull, concat(lit(">="), lower, lit("|<="), lte))
          .otherwise(concat(lit("="), lower))
      struct(
        lit("pkg:openssl/openssl").as("purl"),
        concat(lit("vers:openssl/"), cons).as("affecting_vers"),
        concat(lit("vers:openssl/"),
          when(lt.isNotNull, concat(lit("="), lt)).otherwise(lit("")))
          .as("fixed_vers"))
    })

    o.select(
      col("datasource_id"),
      col("cve").as("advisory_id"),
      summary.as("summary"),
      array().cast("array<string>").as("aliases"),
      refs.as("references"),
      sevs.as("severities"),
      array().cast("array<int>").as("weaknesses"),
      affected.as("affected"),
      coalesce(to_timestamp(col("datePublic")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("datePublic")).as("date_published"),
      concat(lit("https://github.com/openssl/security-advisories/"),
        col("cve")).as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
