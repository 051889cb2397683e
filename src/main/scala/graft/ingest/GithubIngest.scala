package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.AdvisoryRow

/** GitHub GraphQL securityAdvisories ingestion (SURVEY S2; reference
  * importers/github.py + utils.py:256-296 fetch seam): one GraphQL
  * response page per row → AdvisoryRow per advisory node. The HTTP fetch
  * stays outside the engine; this is the distributed parse of captured
  * pages.
  */
object GithubIngest {

  val pageSchema: StructType = StructType.fromDDL(
    """data STRUCT<securityAdvisories: STRUCT<nodes: ARRAY<STRUCT<
      |  ghsaId: STRING, summary: STRING, publishedAt: STRING,
      |  updatedAt: STRING, permalink: STRING,
      |  identifiers: ARRAY<STRUCT<type: STRING, value: STRING>>,
      |  cvss: STRUCT<score: DOUBLE, vectorString: STRING>,
      |  references: ARRAY<STRUCT<url: STRING>>,
      |  vulnerabilities: STRUCT<nodes: ARRAY<STRUCT<
      |    package: STRUCT<ecosystem: STRING, name: STRING>,
      |    vulnerableVersionRange: STRING,
      |    firstPatchedVersion: STRUCT<identifier: STRING>>>>>>>
      |>""".stripMargin)

  /** GitHub range strings ("< 1.2.3", ">= 1.0, < 2.0") → vers constraints. */
  private def ghRangeToVers(range: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(trim(range), ",\\s*", "|"), "\\s+", "")

  /** Semver-family version classes pad dotted bases to three segments
    * (`< 0.3` → `<0.3.0`, SemverVersion via
    * build_range_from_github_advisory_constraint; captured
    * cargo-expected) — applied per constraint, pre-release/build
    * suffixes untouched, other schemes pass through. */
  private def padRangeForScheme(vers: org.apache.spark.sql.Column,
      ptype: org.apache.spark.sql.Column) = {
    def padOne(c: org.apache.spark.sql.Column) = {
      val prefix = regexp_extract(c, "^([^0-9]*)", 1)
      val rest = c.substr(length(prefix) + 1, lit(1 << 20))
      val vnum = regexp_extract(rest, "^([0-9]+(\\.[0-9]+)*)", 1)
      val suffix = rest.substr(length(vnum) + 1, lit(1 << 20))
      val nseg = size(split(vnum, "\\."))
      val pad = when(nseg === 1, ".0.0").when(nseg === 2, ".0")
        .otherwise("")
      when(vnum === "", c).otherwise(concat(prefix, vnum, pad, suffix))
    }
    when(ptype.isin("cargo", "npm", "golang", "composer"),
      array_join(transform(split(vers, "\\|"), padOne(_)), "|"))
      .otherwise(vers)
  }

  /** The securityVulnerabilities EDGE shape — the query the reference's
    * live pipeline actually pages (pipelines/github_importer.py:86,
    * process_response:174-270): one edge per (advisory, package), the
    * advisory nested inside. Cross-validated against the captured
    * github_api responses for all eight ecosystems. */
  val vulnPageSchema: StructType = StructType.fromDDL(
    """data STRUCT<securityVulnerabilities: STRUCT<edges: ARRAY<STRUCT<
      |  node: STRUCT<
      |    advisory: STRUCT<
      |      identifiers: ARRAY<STRUCT<type: STRING, value: STRING>>,
      |      summary: STRING, severity: STRING, publishedAt: STRING,
      |      references: ARRAY<STRUCT<url: STRING>>,
      |      cwes: STRUCT<nodes: ARRAY<STRUCT<cweId: STRING>>>>,
      |    package: STRUCT<name: STRING>,
      |    vulnerableVersionRange: STRING,
      |    firstPatchedVersion: STRUCT<identifier: STRING>>>>>
      |>""".stripMargin)

  /** Parse securityVulnerabilities pages. `raw` columns: datasource_id,
    * package_type (the per-ecosystem fetch parameter — the response does
    * not carry it), json. One AdvisoryRow per edge, like the reference's
    * per-edge AdvisoryData yield (dedup is downstream's job, D2-D4). */
  def parseVulnerabilities(spark: SparkSession,
      raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val edges = raw.withColumn("page", from_json(col("json"), vulnPageSchema))
      .select(col("datasource_id"), col("package_type"),
        explode(col("page.data.securityVulnerabilities.edges")).as("e"))
      .select(col("datasource_id"), col("package_type"),
        col("e.node.advisory").as("adv"),
        col("e.node.package.name").as("pkg_name"),
        col("e.node.vulnerableVersionRange").as("vrange"),
        col("e.node.firstPatchedVersion.identifier").as("fixed"))
      .filter(col("adv").isNotNull)

    val ghsa = expr(
      "try_element_at(filter(adv.identifiers, i -> i.type = 'GHSA'), 1)" +
        ".value")
    // Reference.from_url (importer.py:148-154): the url's last path
    // segment is the id when it looks like a GHSA or CVE (CVE upper-
    // cased), otherwise empty
    val refs = expr(
      """transform(coalesce(adv.references, array()), r -> struct(
        |  r.url AS url,
        |  CASE WHEN upper(regexp_extract(r.url, '([^/]+)/?$', 1))
        |            LIKE '%GHSA-%' THEN 'advisory'
        |       WHEN regexp_extract(r.url, '([^/]+)/?$', 1)
        |            RLIKE '(?i)^cve-\\d{4}-\\d{4,19}' THEN 'advisory'
        |       ELSE 'other' END AS reference_type,
        |  CASE WHEN upper(regexp_extract(r.url, '([^/]+)/?$', 1))
        |            LIKE '%GHSA-%'
        |         THEN regexp_extract(r.url, '([^/]+)/?$', 1)
        |       WHEN regexp_extract(r.url, '([^/]+)/?$', 1)
        |            RLIKE '(?i)^cve-\\d{4}-\\d{4,19}'
        |         THEN upper(regexp_extract(r.url, '([^/]+)/?$', 1))
        |       ELSE '' END AS reference_id))""".stripMargin)

    // get_purl (github_importer.py:140-170): maven needs group:artifact,
    // composer/npm split an optional vendor prefix, the rest are plain;
    // pypi names normalize to lowercase purls
    val t = col("package_type")
    val pn = col("pkg_name")
    val purl =
      when(t === "maven",
        when(pn.contains(":"),
          concat(lit("pkg:maven/"), regexp_replace(pn, ":", "/"))))
        // a scoped vendor prefix ("@xmldom/xmldom") renders with the
        // canonical %40 — str(PackageURL) percent-encodes the namespace
        // (github_api/npm-expected.json pins "%40"-free decoded FIELDS
        // but the purl string itself encodes)
        .when(t.isin("composer", "npm"),
          concat(lit("pkg:"), t, lit("/"), regexp_replace(pn, "^@", "%40")))
        .when(t === "pypi", concat(lit("pkg:pypi/"),
          lower(regexp_replace(pn, "_", "-"))))
        .when(t.isin("nuget", "gem", "golang", "cargo"),
          concat(lit("pkg:"), t, lit("/"), pn))
        .otherwise(lit(null))

    edges.select(
      col("datasource_id"),
      coalesce(ghsa, lit("")).as("advisory_id"),
      // AdvisoryData.__post_init__ strips the summary
      trim(coalesce(col("adv.summary"), lit(""))).as("summary"),
      expr("""sort_array(array_distinct(transform(
             |  coalesce(adv.identifiers, array()), i -> i.value)))"""
        .stripMargin).as("aliases"),
      refs.as("references"),
      // the GHSA reference carries the quality-rating severity in the
      // reference's nested form; ours flattens to the advisory level
      when(col("adv.severity").isNotNull && ghsa.isNotNull,
        array(struct(
          lit("cvssv3.1_qr").as("scoring_system"),
          col("adv.severity").as("value"),
          lit("").as("scoring_elements"),
          concat(lit("https://github.com/advisories/"), ghsa).as("url"))))
        .otherwise(array().cast(
          "array<struct<scoring_system:string,value:string," +
            "scoring_elements:string,url:string>>")).as("severities"),
      expr("""filter(transform(coalesce(adv.cwes.nodes, array()),
             |  c -> CAST(regexp_extract(c.cweId, 'CWE-(\\d+)', 1)
             |       AS INT)), x -> x IS NOT NULL)""".stripMargin)
        .as("weaknesses"),
      when(purl.isNotNull &&
          (col("vrange").isNotNull || col("fixed").isNotNull),
        array(struct(
          purl.as("purl"),
          concat(lit("vers:"), t, lit("/"),
            when(col("vrange").isNotNull,
              padRangeForScheme(ghRangeToVers(col("vrange")), t))
              .otherwise(lit(""))).as("affecting_vers"),
          concat(lit("vers:"), t, lit("/"),
            when(col("fixed").isNotNull, concat(lit("="), col("fixed")))
              .otherwise(lit(""))).as("fixed_vers"))))
        .otherwise(array().cast(
          "array<struct<purl:string,affecting_vers:string," +
            "fixed_vers:string>>")).as("affected"),
      coalesce(to_timestamp(col("adv.publishedAt")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("adv.publishedAt")).as("date_published"),
      concat(lit("https://github.com/advisories/"), coalesce(ghsa, lit("")))
        .as("url"),
      lit(5).as("precedence"))
      .filter(col("advisory_id") =!= "")
      .as[AdvisoryRow]
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val nodes = raw.withColumn("page", from_json(col("json"), pageSchema))
      .select(col("datasource_id"),
        explode(col("page.data.securityAdvisories.nodes")).as("n"))
    nodes.select(
      col("datasource_id"),
      col("n.ghsaId").as("advisory_id"),
      coalesce(col("n.summary"), lit("")).as("summary"),
      expr("""transform(filter(coalesce(n.identifiers, array()),
             |  i -> i.value != n.ghsaId), i -> i.value)""".stripMargin)
        .as("aliases"),
      expr("""transform(coalesce(n.references, array()), r -> struct(
             |  r.url AS url, 'other' AS reference_type,
             |  regexp_extract(r.url, '[^/]+$', 0) AS reference_id))"""
        .stripMargin).as("references"),
      when(col("n.cvss.vectorString").isNotNull,
        array(struct(
          lit("cvssv3.1").as("scoring_system"),
          col("n.cvss.score").cast("string").as("value"),
          col("n.cvss.vectorString").as("scoring_elements"),
          lit("").as("url"))))
        .otherwise(array().cast(
          "array<struct<scoring_system:string,value:string,scoring_elements:string,url:string>>"))
        .as("severities"),
      array().cast("array<int>").as("weaknesses"),
      transform(coalesce(col("n.vulnerabilities.nodes"), array().cast(
        "array<struct<package:struct<ecosystem:string,name:string>,vulnerableVersionRange:string,firstPatchedVersion:struct<identifier:string>>>")),
        v => {
          val eco = lower(v.getField("package").getField("ecosystem"))
          val scheme = when(eco === "pip", "pypi")
            .when(eco.isin("npm", "rubygems", "composer", "go", "rust"),
              "semver")
            .when(eco === "maven", "maven")
            .otherwise("generic")
          // the reference's package_type_by_github_ecosystem
          // (github_importer.py:52-60): RUBYGEMS->gem, RUST->cargo,
          // PIP->pypi, GO->golang; raw lowercase ecosystems would
          // emit pkg:rubygems/... that never joins the pkg:gem/...
          // the gitlab/ruby sources produce for the same package
          val ptype = when(eco === "pip", "pypi")
            .when(eco === "rubygems", "gem")
            .when(eco === "rust", "cargo")
            .when(eco === "go", "golang")
            .otherwise(eco)
          val rawName = v.getField("package").getField("name")
          // maven names arrive as group:artifact; the purl form is
          // namespace/name (github_importer.py get_purl:153-159)
          val pname = when(eco === "maven",
            regexp_replace(rawName, lit(":"), lit("/"))).otherwise(rawName)
          struct(
            concat(lit("pkg:"), ptype, lit("/"), pname).as("purl"),
            concat(lit("vers:"), scheme, lit("/"),
              ghRangeToVers(v.getField("vulnerableVersionRange")))
              .as("affecting_vers"),
            concat(lit("vers:"), scheme, lit("/"),
              when(v.getField("firstPatchedVersion").getField("identifier")
                .isNotNull,
                concat(lit("="),
                  v.getField("firstPatchedVersion").getField("identifier")))
                .otherwise(lit(""))).as("fixed_vers"))
        }).as("affected"),
      coalesce(to_timestamp(col("n.updatedAt")),
        to_timestamp(col("n.publishedAt")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("n.publishedAt")).as("date_published"),
      coalesce(col("n.permalink"), lit("")).as("url"),
      lit(7).as("precedence"))
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }
}
