package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tabular/feed ingestion helpers (SURVEY S2): CSV feeds (KEV-style,
  * utils.py:425-428), NDJSON feeds (NVD-style), enrichment-record
  * normalization. The fetch itself is a driver-side boundary (zero-egress
  * here); these are the distributed parse stages.
  */
object TabularIngest {

  /** KEV-style catalog schema (enhance_with_kev.py:68-99). */
  val kevSchema: StructType = StructType(Seq(
    StructField("cveID", StringType),
    StructField("vendorProject", StringType),
    StructField("product", StringType),
    StructField("shortDescription", StringType),
    StructField("knownRansomwareCampaignUse", StringType),
    StructField("dateAdded", StringType)))

  /** Parse a KEV CSV (header row) into exploit-catalog rows. */
  def kevFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(kevSchema).csv(path)
      .select(
        col("cveID").as("cve"),
        col("shortDescription").as("description"),
        (upper(col("knownRansomwareCampaignUse")) === "KNOWN")
          .as("known_ransomware_campaign_use"),
        to_date(col("dateAdded")).as("date_added"),
        lit("kev").as("data_source"))

  /** Parse an NDJSON advisory feed with an explicit schema. */
  def ndjson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** J10 enrichment: attach exploit-catalog rows to advisories by CVE
    * alias (broadcast the catalog — it is small by construction). */
  def enrichWithExploits(aliasLinks: DataFrame, exploits: DataFrame): DataFrame =
    aliasLinks.join(broadcast(exploits), col("alias") === col("cve"))
      .select(col("avid"), col("cve"), col("data_source"),
        col("known_ransomware_campaign_use"))
}
