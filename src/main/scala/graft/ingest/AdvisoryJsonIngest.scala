package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Ingestion of AdvisoryDataV2-shaped JSON (FIXTURES.md §1 — the
  * reference's own dataclass dump format, importer.py:677-689): one JSON
  * document per advisory with affected_packages carrying version-less
  * purls + vers ranges, references, severities, weaknesses.
  */
object AdvisoryJsonIngest {

  val schema: StructType = StructType(Seq(
    StructField("advisory_id", StringType),
    StructField("aliases", ArrayType(StringType)),
    StructField("summary", StringType),
    StructField("affected_packages", ArrayType(StructType(Seq(
      StructField("package", StructType(Seq(
        StructField("type", StringType),
        StructField("namespace", StringType),
        StructField("name", StringType),
        StructField("version", StringType),
        StructField("qualifiers", StringType),
        StructField("subpath", StringType)))),
      StructField("affected_version_range", StringType),
      StructField("fixed_version_range", StringType),
      StructField("fixed_by_commit_patches", ArrayType(StructType(Seq(
        StructField("vcs_url", StringType),
        StructField("commit_hash", StringType))))))))),
    StructField("references", ArrayType(StructType(Seq(
      StructField("reference_id", StringType),
      StructField("reference_type", StringType),
      StructField("url", StringType))))),
    StructField("severities", ArrayType(StructType(Seq(
      StructField("system", StringType),
      StructField("value", StringType),
      StructField("scoring_elements", StringType),
      StructField("published_at", StringType),
      StructField("url", StringType))))),
    StructField("date_published", StringType),
    StructField("weaknesses", ArrayType(IntegerType)),
    StructField("url", StringType)))

  /** Parse raw JSON rows (columns json, datasource_id, optional
    * date_collected) into AdvisoryRow. */
  def parse(spark: SparkSession, raw: DataFrame, precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val base = raw.withColumn("a", from_json(col("json"), schema))
    val withCollected =
      if (base.columns.contains("date_collected")) base
      else base.withColumn("date_collected",
        coalesce(to_timestamp(col("a.date_published")),
          to_timestamp(lit("1970-01-01"))))
    withCollected.select(
      col("datasource_id"),
      col("a.advisory_id").as("advisory_id"),
      coalesce(col("a.summary"), lit("")).as("summary"),
      coalesce(col("a.aliases"), array()).as("aliases"),
      transform(coalesce(col("a.references"),
        array().cast("array<struct<reference_id:string,reference_type:string,url:string>>")),
        r => struct(
          r.getField("url").as("url"),
          coalesce(r.getField("reference_type"), lit("other"))
            .as("reference_type"),
          coalesce(r.getField("reference_id"),
            regexp_extract(r.getField("url"), "[^/]+$", 0))
            .as("reference_id"))).as("references"),
      // severity url (VulnerabilitySeverity.url, importer.py:50-56) is
      // what the risk stack's domain-weight lookup keys on — a severity
      // without one is skipped by the weighted max (risk.py:42-43)
      transform(coalesce(col("a.severities"),
        array().cast("array<struct<system:string,value:string,scoring_elements:string,published_at:string,url:string>>")),
        sv => struct(
          sv.getField("system").as("scoring_system"),
          sv.getField("value").as("value"),
          coalesce(sv.getField("scoring_elements"), lit(""))
            .as("scoring_elements"),
          coalesce(sv.getField("url"), lit("")).as("url"))).as("severities"),
      coalesce(col("a.weaknesses"), array().cast("array<int>"))
        .as("weaknesses"),
      transform(coalesce(col("a.affected_packages"), array().cast(
        schema("affected_packages").dataType.simpleString)), ap => struct(
        concat(lit("pkg:"), lower(ap.getField("package").getField("type")),
          when(length(coalesce(ap.getField("package").getField("namespace"),
            lit(""))) > 0,
            concat(lit("/"), ap.getField("package").getField("namespace")))
            .otherwise(lit("")),
          lit("/"), ap.getField("package").getField("name")).as("purl"),
        coalesce(ap.getField("affected_version_range"), lit(""))
          .as("affecting_vers"),
        coalesce(ap.getField("fixed_version_range"), lit(""))
          .as("fixed_vers"))).as("affected"),
      col("date_collected"),
      to_timestamp(col("a.date_published")).as("date_published"),
      coalesce(col("a.url"), lit("")).as("url"),
      lit(precedence).as("precedence"))
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }

  /** Structured fixed-by commit links (importer.py:207-301 PatchData /
    * fixed_by_commit_patches): (avid, vcs_url, commit_hash) rows that
    * AdvisoryRow cannot carry — feed them to
    * AdvisoryDerive.commitPatchesFromLinks. */
  def commitLinks(spark: SparkSession, raw: DataFrame): DataFrame =
    raw.withColumn("a", from_json(col("json"), schema))
      .select(
        concat(col("datasource_id"), lit("/"), col("a.advisory_id"))
          .as("avid"),
        explode(coalesce(col("a.affected_packages"), array().cast(
          schema("affected_packages").dataType.simpleString))).as("ap"))
      .select(col("avid"),
        explode(col("ap.fixed_by_commit_patches")).as("p"))
      .select(col("avid"), col("p.vcs_url").as("vcs_url"),
        col("p.commit_hash").as("commit_hash"))
      .filter(col("vcs_url").isNotNull && col("commit_hash").isNotNull)
      .distinct()

  /** Read a directory of per-advisory JSON files. */
  def readTree(spark: SparkSession, path: String, datasourceId: String): Dataset[AdvisoryRow] = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("json"), lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }

  /** Raw (json, datasource_id) rows for a tree — for secondary extracts
    * like [[commitLinks]]. */
  def rawTree(spark: SparkSession, path: String, datasourceId: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("json"), lit(datasourceId).as("datasource_id"))
}
