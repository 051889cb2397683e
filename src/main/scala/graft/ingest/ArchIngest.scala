package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Arch Linux AVG feed ingestion (S2): security.archlinux.org/json — one
  * array of advisory-group records, each naming packages with single
  * affected/fixed versions (pipelines/v2_importers/archlinux_importer.py:
  * 44-123). Declarative explode over the record array.
  *
  * alpm version ordering falls back to the generic scheme here; AVG
  * records only carry `=version` pins, so range semantics never depend
  * on it.
  */
object ArchIngest {

  private val Record = StructType(Seq(
    StructField("name", StringType),
    StructField("packages", ArrayType(StringType)),
    StructField("severity", StringType),
    StructField("type", StringType),
    StructField("affected", StringType),
    StructField("fixed", StringType),
    StructField("issues", ArrayType(StringType)),
    StructField("advisories", ArrayType(StringType))))

  private val SeverityChoices =
    Seq("Critical", "High", "Medium", "Low", "Very Low")

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw
      .select(col("datasource_id"),
        explode(from_json(col("json"), ArrayType(Record))).as("r"))
      .select(col("datasource_id"), col("r.*"))
      .filter(col("name").isNotNull)

    val avgUrl = concat(lit("https://security.archlinux.org/"), col("name"))
    val advisoriesArr = coalesce(col("advisories"),
      array().cast("array<string>"))
    val refs = concat(
      array(struct(avgUrl.as("url"), lit("advisory").as("reference_type"),
        col("name").as("reference_id"))),
      transform(advisoriesArr, a => struct(
        concat(lit("https://security.archlinux.org/"), a).as("url"),
        lit("advisory").as("reference_type"),
        a.as("reference_id"))))

    val sevs = when(col("severity").isin(SeverityChoices: _*),
      array(struct(
        lit("archlinux").as("scoring_system"),
        col("severity").as("value"),
        lit("").as("scoring_elements"),
        concat(avgUrl, lit(".json")).as("url"))))
      .otherwise(array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>"))

    o.select(
      col("datasource_id"),
      col("name").as("advisory_id"),
      when(col("type").isNull || col("type") === "unknown", "")
        .otherwise(col("type")).as("summary"),
      concat(coalesce(col("issues"), array().cast("array<string>")),
        advisoriesArr).as("aliases"),
      refs.as("references"),
      sevs.as("severities"),
      array().cast("array<int>").as("weaknesses"),
      transform(coalesce(col("packages"), array().cast("array<string>")),
        p => struct(
          concat(lit("pkg:alpm/archlinux/"), p).as("purl"),
          concat(lit("vers:alpm/"),
            when(col("affected").isNotNull,
              concat(lit("="), col("affected"))).otherwise(lit("")))
            .as("affecting_vers"),
          concat(lit("vers:alpm/"),
            when(col("fixed").isNotNull, concat(lit("="), col("fixed")))
              .otherwise(lit(""))).as("fixed_vers"))).as("affected"),
      to_timestamp(lit("1970-01-01")).as("date_collected"),
      lit(null).cast("timestamp").as("date_published"),
      concat(avgUrl, lit(".json")).as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
