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
  /** apk version grammar (digits[.digits]* [letter] [_suffix[num]]*
    * [-r num]) — e.g. `2.7.2-r0` valid, `4.10-1-r1` not. */
  private val ApkVersionRe =
    "^[0-9]+(\\.[0-9]+)*[a-zA-Z]?" +
      "((_alpha|_beta|_pre|_rc|_cvs|_svn|_git|_hg|_p)[0-9]*)*(-r[0-9]+)?$"

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

    // the reference records the distro DIRECTORY page as the advisory
    // url (captured expected: `https://secdb.alpinelinux.org/v3.11/`),
    // not the repo json file inside it
    val url = concat(lit("https://secdb.alpinelinux.org/"),
      regexp_extract(col("path"), "([^/]+)/[^/]+$", 1), lit("/"))

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
      // a secfix version that is not a valid apk version yields NO
      // affected packages — the advisory row still carries its aliases
      // (alpine_linux_importer.py:202-219 InvalidVersion skip; captured
      // XSA-252 entry `4.10-1-r1` has affected_packages: [])
      when(col("version").rlike(ApkVersionRe),
        transform(purls, p => struct(
          p.as("purl"),
          // secdb fixes carry the apk scheme (captured `vers:apk/…`);
          // VersionOrd orders apk and alpine identically
          lit("vers:apk/").as("affecting_vers"),
          concat(lit("vers:apk/="), col("version")).as("fixed_vers"))))
        .otherwise(array().cast(
          "array<struct<purl:string,affecting_vers:string," +
            "fixed_vers:string>>"))
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
