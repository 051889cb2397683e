package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** curl security advisories ingestion (S2): the curl.se OSV-flavored JSON
  * feed (pipelines/v2_importers/curl_importer.py:53-157). Pure
  * `from_json` + column mapping: affected versions are explicit pins,
  * the fixed version is the SEMVER range's `fixed` event, severity/CWE/
  * reference URLs live under `database_specific`.
  */
object CurlIngest {

  val curlSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("aliases", ArrayType(StringType)),
    StructField("summary", StringType),
    StructField("published", StringType),
    StructField("affected", ArrayType(StructType(Seq(
      StructField("versions", ArrayType(StringType)),
      StructField("ranges", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("events", ArrayType(MapType(StringType, StringType))))))))))),
    StructField("database_specific", StructType(Seq(
      StructField("www", StringType),
      StructField("issue", StringType),
      StructField("URL", StringType),
      StructField("severity", StringType),
      StructField("CWE", StructType(Seq(StructField("id", StringType)))))))))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("c", from_json(col("json"), curlSchema))
      .select(col("datasource_id"), col("c.*"))
      // invalid/missing CVE alias rows are skipped (curl_importer.py:55-60)
      .filter(try_element_at(coalesce(col("aliases"),
        array().cast("array<string>")), lit(1)).startsWith("CVE"))

    val a0 = try_element_at(col("affected"), lit(1))
    val range0 = try_element_at(a0.getField("ranges"), lit(1))
    val fixedEvent = try_element_at(
      try_element_at(range0.getField("events"), lit(2)), lit("fixed"))
    val pins = transform(coalesce(a0.getField("versions"),
      array().cast("array<string>")), v => concat(lit("="), v))

    val refs = filter(array(
      when(col("database_specific.www").isNotNull, struct(
        col("database_specific.www").as("url"),
        lit("advisory").as("reference_type"),
        lit("").as("reference_id"))),
      when(col("database_specific.issue").isNotNull, struct(
        col("database_specific.issue").as("url"),
        lit("bug").as("reference_type"),
        lit("").as("reference_id")))), r => r.isNotNull)

    o.select(
      col("datasource_id"),
      col("id").as("advisory_id"),
      coalesce(col("summary"), lit("")).as("summary"),
      filter(coalesce(col("aliases"), array().cast("array<string>")),
        a => a =!= col("id")).as("aliases"),
      refs.as("references"),
      array(struct(
        lit("cvssv3.1").as("scoring_system"),
        coalesce(col("database_specific.severity"), lit("")).as("value"),
        lit("").as("scoring_elements"),
        coalesce(col("database_specific.www"), lit("")).as("url")))
        .as("severities"),
      filter(array(regexp_extract(col("database_specific.CWE.id"),
        "CWE-(\\d+)", 1).cast("int")), w => w.isNotNull).as("weaknesses"),
      array(struct(
        lit("pkg:generic/curl.se/curl").as("purl"),
        concat(lit("vers:generic/"), array_join(pins, "|"))
          .as("affecting_vers"),
        concat(lit("vers:generic/"),
          when(range0.getField("type") === "SEMVER" &&
            fixedEvent.isNotNull, concat(lit("="), fixedEvent))
            .otherwise(lit(""))).as("fixed_vers"))).as("affected"),
      coalesce(to_timestamp(col("published")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("published")).as("date_published"),
      coalesce(col("database_specific.URL"), lit("")).as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
