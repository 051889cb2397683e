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
