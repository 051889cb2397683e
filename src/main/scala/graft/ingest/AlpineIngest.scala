package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Alpine Linux secdb ingestion (S2): one JSON per (distroversion, repo)
  * listing packages with per-version secfixes
  * (pipelines/v2_importers/alpine_linux_importer.py:36-238).
  *
  * Wholly declarative: nested explodes over packages → secfixes map →
  * space-separated vuln-id strings, with the id cleaning (parenthetical
  * removal, `_`→`-`, `.patch` strip, valid-prefix filter) as Catalyst
  * string expressions — the per-file Python loops become one scan.
  */
object AlpineIngest {

  val secdbSchema: StructType = StructType(Seq(
    StructField("archs", ArrayType(StringType)),
    StructField("reponame", StringType),
    StructField("distroversion", StringType),
    StructField("packages", ArrayType(StructType(Seq(
      StructField("pkg", StructType(Seq(
        StructField("name", StringType),
        StructField("secfixes",
          MapType(StringType, ArrayType(StringType))))))))))))

  /** alias validity (alpine_linux_importer.py:271-308): proper CVE ids or
    * one of the known tracker prefixes. */
  private val ValidAlias =
    "^(CVE-\\d{4}-\\d{4,19}$|XSA-|GHSL-|TALOS-|RUSTSEC-|GHSA-|GNUTLS-|VSV|" +
      "ZDI-CAN-|DW|YSA-|ZBX-|ALPINE-|TS-|OSEC-|wnpa-sec-)"

  private def refFor(id: Column): Column =
    when(id.startsWith("XSA"), struct(
      concat(lit("https://xenbits.xen.org/xsa/advisory-"),
        regexp_extract(id, "-([^-]+)$", 1), lit(".html")).as("url"),
      lit("advisory").as("reference_type"), id.as("reference_id")))
      .when(id.startsWith("ZBX"), struct(
        concat(lit("https://support.zabbix.com/browse/"), id).as("url"),
        lit("advisory").as("reference_type"), id.as("reference_id")))
      .when(id.startsWith("wnpa-sec"), struct(
        concat(lit("https://www.wireshark.org/security/"), id, lit(".html"))
          .as("url"),
        lit("advisory").as("reference_type"), id.as("reference_id")))
      .when(id.startsWith("CVE"), struct(
        concat(lit("https://nvd.nist.gov/vuln/detail/"), id).as("url"),
        lit("advisory").as("reference_type"), id.as("reference_id")))
      .otherwise(lit(null))

  /** Parse a DataFrame of raw secdb JSON strings (columns `datasource_id`,
    * `json`, optional `path` for the secdb URL suffix). */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val withPath = if (raw.columns.contains("path")) raw
      else raw.withColumn("path", lit(""))
    val o = withPath.withColumn("db", from_json(col("json"), secdbSchema))
      .select(col("datasource_id"), col("path"), col("db.*"))
      .filter(col("packages").isNotNull && size(col("packages")) > 0 &&
        col("distroversion").isNotNull && col("reponame").isNotNull &&
        col("archs").isNotNull)

    val url = concat(lit("https://secdb.alpinelinux.org/"),
      regexp_extract(col("path"), "([^/]+/[^/]+)$", 0))

    val exploded = o
      .select(col("datasource_id"), col("distroversion"), col("reponame"),
        col("archs"), url.as("url"), explode(col("packages")).as("p"))
      .filter(col("p.pkg.name").isNotNull)
      .select(col("datasource_id"), col("distroversion"), col("reponame"),
        col("archs"), col("url"), col("p.pkg.name").as("name"),
        explode(col("p.pkg.secfixes")).as(Seq("version", "fixed_vulns")))
      .select(col("datasource_id"), col("distroversion"), col("reponame"),
        col("archs"), col("url"), col("name"), col("version"),
        explode(col("fixed_vulns")).as("vuln_ids"))

    // clean: drop parentheticals, split, _→- and .patch strip, keep valid
    val cleaned = exploded.withColumn("aliases",
      filter(transform(
        split(trim(regexp_replace(col("vuln_ids"), "\\(.*?\\)", "")), "\\s+"),
        a => regexp_replace(regexp_replace(a, "_", "-"), "\\.patch", "")),
        a => a.rlike(ValidAlias)))
      .filter(size(col("aliases")) > 0)
      .withColumn("vuln_id", col("aliases").getItem(0))

    val purls = filter(transform(col("archs"), arch =>
      concat(lit("pkg:apk/alpine/"), col("name"),
        lit("?arch="), arch,
        lit("&distroversion="), col("distroversion"),
        lit("&reponame="), col("reponame"))), p => p.isNotNull)

    cleaned.select(
      col("datasource_id"),
      concat_ws("/", col("name"), col("distroversion"), col("version"),
        col("vuln_id")).as("advisory_id"),
      lit("").as("summary"),
      col("aliases"),
      filter(array(refFor(col("vuln_id"))), r => r.isNotNull)
        .as("references"),
      array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>").as("severities"),
      array().cast("array<int>").as("weaknesses"),
      transform(purls, p => struct(
        p.as("purl"),
        lit("vers:alpine/").as("affecting_vers"),
        concat(lit("vers:alpine/="), col("version")).as("fixed_vers")))
        .as("affected"),
      to_timestamp(lit("1970-01-01")).as("date_collected"),
      lit(null).cast("timestamp").as("date_published"),
      col("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }

  /** Read a secdb tree (one JSON per repo). */
  def readTree(spark: SparkSession, path: String,
      datasourceId: String = "alpine_linux"): Dataset[AdvisoryRow] = {
    val raw = spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.json").text(path)
      .select(col("value").as("json"), input_file_name().as("path"),
        lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }
}
