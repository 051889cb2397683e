package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** RetireNet (.NET) advisories ingestion (S2): one JSON per advisory
  * under Content/, packages grouped by nuget id with affected/fix version
  * pins (pipelines/v2_importers/retiredotnet_importer.py:44-125). */
object RetireDotnetIngest {

  val schema: StructType = StructType(Seq(
    StructField("description", StringType),
    StructField("link", StringType),
    StructField("packages", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("affected", StringType),
      StructField("fix", StringType)))))))

  /** Parse rows of (datasource_id, path, json); the file stem becomes the
    * advisory id like the reference's `retiredotnet-<stem>`. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("d", from_json(col("json"), schema))
      .withColumn("stem", regexp_extract(col("path"), "([^/]+)\\.json$", 1))
      // from_json yields a struct of nulls on malformed input; a record
      // with no description, link or packages is an unparsed file
      .filter(length(col("stem")) > 0 &&
        (col("d.description").isNotNull || col("d.link").isNotNull ||
          col("d.packages").isNotNull))

    val pkgs = coalesce(col("d.packages"),
      array().cast(ArrayType(schema("packages").dataType
        .asInstanceOf[ArrayType].elementType)))
    // group by package id: every affected/fix version becomes a pin
    val names = array_distinct(transform(pkgs, p => p.getField("id")))
    val affected = filter(transform(names, n => {
      val mine = filter(pkgs, p => p.getField("id") === n)
      val aff = array_distinct(filter(transform(mine,
        p => p.getField("affected")), v => v.isNotNull))
      val fix = array_distinct(filter(transform(mine,
        p => p.getField("fix")), v => v.isNotNull))
      when(n.isNotNull && (size(aff) > 0 || size(fix) > 0), struct(
        concat(lit("pkg:nuget/"), n).as("purl"),
        concat(lit("vers:nuget/"), array_join(transform(array_sort(aff),
          v => concat(lit("="), v)), "|")).as("affecting_vers"),
        concat(lit("vers:nuget/"), array_join(transform(array_sort(fix),
          v => concat(lit("="), v)), "|")).as("fixed_vers")))
    }), p => p.isNotNull)

    o.select(
      col("datasource_id"),
      concat(lit("retiredotnet-"), col("stem")).as("advisory_id"),
      coalesce(col("d.description"), lit("")).as("summary"),
      filter(array(regexp_extract(col("d.description"),
        "(CVE-\\d+-\\d+)", 1)), a => length(a) > 0).as("aliases"),
      filter(array(when(col("d.link").isNotNull, struct(
        col("d.link").as("url"),
        lit("advisory").as("reference_type"),
        lit("").as("reference_id")))),
        r => r.isNotNull).as("references"),
      array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>").as("severities"),
      array().cast("array<int>").as("weaknesses"),
      affected.as("affected"),
      to_timestamp(lit("1970-01-01")).as("date_collected"),
      lit(null).cast("timestamp").as("date_published"),
      // the reference builds the advisory url from the bare file name
      // (retiredotnet_importer.py advisory_url, captured expected_file)
      concat(lit("https://github.com/RetireNet/Packages/blob/master/"),
        col("stem"), lit(".json")).as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
