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

  /** KEV v2 catalog: one JSON document with a `vulnerabilities` array
    * (v2_improvers/enhance_with_kev.py:57-95). Each record becomes one
    * exploit-catalog row keyed by its CVE (`record_id=cveID`,
    * `data_source="KEV"`), carrying the v2 fields the CSV form lacks
    * (required_action, due_date, notes);
    * `known_ransomware_campaign_use` is the ternary string compared to
    * the literal "Known". */
  def kevFromJson(spark: SparkSession, path: String): DataFrame = {
    val record = StructType(Seq(
      StructField("cveID", StringType),
      StructField("shortDescription", StringType),
      StructField("dateAdded", StringType),
      StructField("requiredAction", StringType),
      StructField("dueDate", StringType),
      StructField("notes", StringType),
      StructField("knownRansomwareCampaignUse", StringType)))
    val catalog = StructType(Seq(
      StructField("vulnerabilities", ArrayType(record))))
    spark.read.option("multiLine", "true").schema(catalog).json(path)
      .select(explode(col("vulnerabilities")).as("v"))
      .filter(col("v.cveID").isNotNull && length(col("v.cveID")) > 0)
      .select(
        col("v.cveID").as("alias"),
        col("v.cveID").as("record_id"),
        lit("KEV").as("data_source"),
        col("v.shortDescription").as("description"),
        to_date(col("v.dateAdded")).as("date_added"),
        col("v.requiredAction").as("required_action"),
        to_date(col("v.dueDate")).as("due_date"),
        col("v.notes").as("notes"),
        (col("v.knownRansomwareCampaignUse") === "Known")
          .as("known_ransomware_campaign_use"))
  }

  /** PyPI releases payloads → version-universe rows for the
    * valid-version improver (the reference fetches the same payload
    * per-package through fetchcode's PYPI path and keeps EVERY
    * `releases` key verbatim — prereleases and junk entries included,
    * pinned by package_manager_data/pypi.json's "vulnerabilities" key
    * in test_github_importer_pipeline.py:300-333).
    *
    * Input: (name, json) rows — one raw API payload per package (the
    * fetch is a driver-side boundary in both systems; at scale this is
    * an NDJSON feed of payloads and the parse distributes per-row).
    * Output: (ptype, namespace, name, version) as
    * [[graft.derive.Improvers.validVersionInferences]] expects. */
  def pypiReleaseVersions(payloads: DataFrame): DataFrame = {
    // keys carry the versions; values (arrays of file dicts) are
    // irrelevant — a minimal value schema keeps the parse cheap
    val releases = MapType(StringType,
      ArrayType(StructType(Seq(StructField("filename", StringType)))))
    payloads.select(col("name"),
      explode(map_keys(from_json(
        get_json_object(col("json"), "$.releases"), releases)))
        .as("version"))
      .select(lit("pypi").as("ptype"),
        lit(null).cast("string").as("namespace"),
        col("name"), col("version"))
  }

  /** Parse an NDJSON advisory feed with an explicit schema. */
  def ndjson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** J10 enrichment: attach exploit-catalog rows to advisories by CVE
    * alias (broadcast the catalog — it is small by construction). */
  def enrichWithExploits(aliasLinks: DataFrame, exploits: DataFrame): DataFrame =
    aliasLinks.join(broadcast(exploits), col("alias") === col("cve"))
      .select(col("avid"), col("cve"), col("data_source"),
        col("known_ransomware_campaign_use"))

  /** Exploit-DB files_exploits.csv schema subset
    * (v2_improvers/enhance_with_exploitdb.py:64-130). */
  val exploitDbSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("file", StringType),
    StructField("description", StringType),
    StructField("date_published", StringType),
    StructField("author", StringType),
    StructField("type", StringType),
    StructField("platform", StringType),
    StructField("port", StringType),
    StructField("date_added", StringType),
    StructField("date_updated", StringType),
    StructField("verified", StringType),
    StructField("codes", StringType),
    StructField("tags", StringType),
    StructField("aliases", StringType),
    StructField("screenshot_url", StringType),
    StructField("application_url", StringType),
    StructField("source_url", StringType)))

  /** Parse Exploit-DB's catalog CSV into per-alias exploit records: the
    * `codes` column holds `;`-separated CVE/OSVDB ids, each becoming one
    * match key (enhance_with_exploitdb.py:72-130, Exploit model
    * models.py:1720-1808). */
  def exploitDbFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(exploitDbSchema).csv(path)
      .filter(col("codes").isNotNull && length(trim(col("codes"))) > 0)
      .select(explode(split(col("codes"), ";")).as("alias"),
        lit("Exploit-DB").as("data_source"),
        to_date(col("date_added")).as("date_added"),
        col("description"),
        // the reference maps the catalog's `verified` flag here
        // (enhance_with_exploitdb.py:119)
        (col("verified") === "1").as("known_ransomware_campaign_use"),
        to_date(col("date_published")).as("source_date_published"),
        col("type").as("exploit_type"),
        col("platform"),
        to_date(col("date_updated")).as("source_date_updated"),
        col("source_url"),
        lit(null).cast("string").as("notes"))
      .withColumn("record_id", col("alias"))
      .filter(length(col("alias")) > 0)

  /** PoC-in-GitHub tree (v2_improvers/enhance_with_github_poc.py:42-80):
    * one `<CVE-id>.json` per vulnerability holding an array of PoC repos;
    * the filename is the match alias. */
  def githubPocFromTree(spark: SparkSession, path: String): DataFrame = {
    val pocSchema = ArrayType(StructType(Seq(
      StructField("html_url", StringType),
      StructField("created_at", StringType),
      StructField("updated_at", StringType))))
    spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.json").text(path)
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.json$", 1).as("alias"),
        explode(from_json(col("value"), pocSchema)).as("p"))
      .filter(col("p.html_url").isNotNull)
      .select(trim(col("alias")).as("alias"),
        col("p.html_url").as("url"),
        to_timestamp(col("p.created_at")).as("created_at"),
        to_timestamp(col("p.updated_at")).as("updated_at"))
  }

  private val MetasploitRecord = StructType(Seq(
    StructField("description", StringType),
    StructField("notes", MapType(StringType, ArrayType(StringType))),
    StructField("platform", StringType),
    StructField("path", StringType),
    StructField("disclosure_date", StringType),
    StructField("references", ArrayType(StringType))))

  /** Parse the Metasploit modules JSON (one object keyed by module name)
    * into per-reference exploit records
    * (v2_improvers/enhance_with_metasploit.py:59-130). */
  def metasploitFromJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
    raw.select(explode(from_json(col("value"),
        MapType(StringType, MetasploitRecord))).as(Seq("module", "r")))
      .filter(col("r.path").isNotNull)
      .select(col("r.*"))
      .select(
        explode(filter(coalesce(col("references"),
          array().cast("array<string>")),
          ref => !ref.startsWith("OSVDB") && !ref.startsWith("URL-")))
          .as("alias"),
        col("path").as("record_id"),
        lit("Metasploit").as("data_source"),
        lit(null).cast("date").as("date_added"),
        col("description"),
        lit(false).as("known_ransomware_campaign_use"),
        to_date(col("disclosure_date")).as("source_date_published"),
        lit(null).cast("string").as("exploit_type"),
        col("platform"),
        lit(null).cast("date").as("source_date_updated"),
        concat(
          lit("https://github.com/rapid7/metasploit-framework/tree/master"),
          col("path")).as("source_url"),
        to_json(col("notes")).as("notes"))
  }
}
