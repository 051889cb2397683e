package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EPSS feed ingestion (S2): the FIRST Exploit Prediction Scoring System
  * daily CSV, per the reference's epss importer
  * (pipelines/v2_importers/epss_importer_v2.py:26-96).
  *
  * Feed shape: a `#model_version:...,score_date:<iso>` preamble line, a
  * `cve,epss,percentile` header, then one row per CVE. The preamble's
  * score_date becomes every row's published_at. The parse is a
  * distributed CSV scan (the comment option drops the preamble on every
  * partition); only the one-line preamble read is driver-side.
  */
object EpssIngest {

  val epssSchema: StructType = StructType(Seq(
    StructField("cve", StringType),
    StructField("epss", StringType),
    StructField("percentile", StringType)))

  /** Exploitability lift threshold: EPSS score above this marks the
    * advisory high-epss (risk.py:64-92 tier 2.0). */
  val HighEpssThreshold = 0.8

  /** Parse an EPSS CSV into (cve, score, percentile, published_at). */
  def fromCsv(spark: SparkSession, path: String): DataFrame = {
    // score_date lives only in the preamble comment; one driver-side line
    val preamble = spark.read.textFile(path).first()
    val scoreDate = preamble.split(",").collectFirst {
      case s if s.startsWith("score_date:") => s.substring("score_date:".length)
    }.orNull
    spark.read.option("header", "true").option("comment", "#")
      .schema(epssSchema).csv(path)
      .filter(col("cve").isNotNull && col("epss").isNotNull &&
        col("percentile").isNotNull)
      .select(
        col("cve"),
        col("epss").cast("double").as("score"),
        col("percentile").cast("double").as("percentile"),
        to_timestamp(lit(scoreDate)).as("published_at"))
  }

  /** Severity-donor rows for AdvisoryDerive.relateSeverities (J11):
    * one donor per CVE keyed for alias/advisory_id matching, carrying the
    * epss scoring-system severity (epss_importer_v2.py:73-80 shape). */
  def donors(epss: DataFrame): DataFrame =
    epss.select(
      concat(lit("epss/"), col("cve")).as("donor_id"),
      col("cve").as("match_key"),
      lit("epss").as("scoring_system"),
      col("score"),
      col("percentile").cast("string").as("scoring_elements"),
      col("published_at"),
      concat(lit("https://api.first.org/data/v1/epss?cve="), col("cve"))
        .as("url"))
}
