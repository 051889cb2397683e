package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Xen XSA feed ingestion (S2): xsa.json — one document whose first
  * element lists every XSA with title, CVEs and publication time
  * (pipelines/v2_importers/xen_importer.py:60-105). */
object XenIngest {

  val xsaSchema: DataType = ArrayType(StructType(Seq(
    StructField("xsas", ArrayType(StructType(Seq(
      StructField("xsa", StringType),
      StructField("title", StringType),
      StructField("public_time", StringType),
      StructField("cve", ArrayType(StringType)))))))))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw
      .select(col("datasource_id"),
        explode(try_element_at(from_json(col("json"), xsaSchema), lit(1))
          .getField("xsas")).as("x"))
      .filter(col("x.xsa").isNotNull)
      .select(
        col("datasource_id"),
        concat(lit("XSA-"), col("x.xsa")).as("advisory_id"),
        coalesce(col("x.title"), lit("")).as("summary"),
        coalesce(col("x.cve"), array().cast("array<string>")).as("aliases"),
        array(struct(
          concat(lit("https://xenbits.xen.org/xsa/advisory-"), col("x.xsa"),
            lit(".html")).as("url"),
          lit("advisory").as("reference_type"),
          concat(lit("XSA-"), col("x.xsa")).as("reference_id")))
          .as("references"),
        array().cast(
          "array<struct<scoring_system:string,value:string," +
            "scoring_elements:string,url:string>>").as("severities"),
        array().cast("array<int>").as("weaknesses"),
        array().cast(
          "array<struct<purl:string,affecting_vers:string,fixed_vers:string>>")
          .as("affected"),
        coalesce(to_timestamp(col("x.public_time")),
          to_timestamp(lit("1970-01-01"))).as("date_collected"),
        to_timestamp(col("x.public_time")).as("date_published"),
        concat(lit("https://xenbits.xen.org/xsa/advisory-"), col("x.xsa"),
          lit(".html")).as("url"),
        lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
