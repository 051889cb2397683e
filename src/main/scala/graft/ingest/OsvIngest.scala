package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** OSV-format advisory ingestion (SURVEY S1/S4).
  *
  * The reference parses OSV JSON trees (PyPA/PySec/OSV/GitHub/Ubuntu all
  * share it — importers/osv.py:51-331, pipes/osv_v2.py:61-507). Spark-first
  * shape: `spark.read.json` (or `.text` + `from_json`) over the checked-out
  * tree with an explicit schema, then a declarative column mapping into
  * `AdvisoryRow` — per-file Python parsing becomes one distributed scan,
  * fully inside whole-stage codegen (no UDFs).
  */
object OsvIngest {

  /** Explicit OSV subset schema (explicit > inferred: inference would scan
    * twice and drift per input batch). */
  val osvSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("summary", StringType),
    StructField("details", StringType),
    StructField("aliases", ArrayType(StringType)),
    StructField("published", StringType),
    StructField("modified", StringType),
    StructField("affected", ArrayType(StructType(Seq(
      StructField("package", StructType(Seq(
        StructField("ecosystem", StringType),
        StructField("name", StringType),
        StructField("purl", StringType)))),
      StructField("ranges", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("events", ArrayType(MapType(StringType, StringType))))))),
      StructField("versions", ArrayType(StringType)))))),
    StructField("severity", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("score", StringType))))),
    StructField("references", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("url", StringType)))))))

  /** univers scheme for an OSV ecosystem (RANGE_CLASS_BY_SCHEMES subset). */
  private def schemeFor(eco: Column): Column =
    when(eco === "pypi", "pypi")
      .when(eco.isin("npm", "crates.io", "go", "rubygems", "packagist",
        "hex"), "semver")
      .when(eco.isin("debian", "ubuntu"), "deb")
      .when(eco === "maven", "maven")
      .when(eco.isin("alpine", "apk"), "alpine")
      .otherwise("generic")

  /** OSV range events → affected-range constraints (>=introduced, <fixed,
    * <=last_affected), plus the explicit `versions` list as `=` pins
    * (PyPA commonly enumerates concrete versions instead of ranges). */
  private def affectingConstraints(a: Column): Column = {
    val evs = flatten(transform(coalesce(a.getField("ranges"),
      array().cast("array<struct<type:string,events:array<map<string,string>>>>")),
      rg => transform(rg.getField("events"), e =>
        when(element_at(e, "introduced") === "0", lit(">=0"))
          .when(element_at(e, "introduced").isNotNull,
            concat(lit(">="), element_at(e, "introduced")))
          .when(element_at(e, "fixed").isNotNull,
            concat(lit("<"), element_at(e, "fixed")))
          .when(element_at(e, "last_affected").isNotNull,
            concat(lit("<="), element_at(e, "last_affected")))
          .otherwise(lit(null)))))
    val pins = transform(coalesce(a.getField("versions"),
      array().cast("array<string>")), v => concat(lit("="), v))
    filter(concat(evs, pins), c => c.isNotNull)
  }

  /** fixed events become `=` pins (the reference's exact-fixed semantics). */
  private def fixedConstraints(a: Column): Column = {
    val evs = flatten(transform(coalesce(a.getField("ranges"),
      array().cast("array<struct<type:string,events:array<map<string,string>>>>")),
      rg => transform(rg.getField("events"), e =>
        when(element_at(e, "fixed").isNotNull,
          concat(lit("="), element_at(e, "fixed")))
          .otherwise(lit(null)))))
    filter(evs, c => c.isNotNull)
  }

  /** Parse a DataFrame of raw OSV JSON strings (column `json`, plus
    * `datasource_id`) into typed advisories. */
  def parse(spark: SparkSession, raw: DataFrame, precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("osv", from_json(col("json"), osvSchema))
      .select(col("datasource_id"), col("osv.*"))

    val refs = transform(coalesce(col("references"),
      array().cast("array<struct<type:string,url:string>>")), r => struct(
      r.getField("url").as("url"),
      when(r.getField("type") === "ADVISORY", "advisory")
        .when(r.getField("type") === "EXPLOIT", "exploit")
        .when(r.getField("type") === "REPORT", "bug")
        .otherwise("other").as("reference_type"),
      regexp_extract(r.getField("url"), "[^/]+$", 0).as("reference_id")))

    val sevs = transform(coalesce(col("severity"),
      array().cast("array<struct<type:string,score:string>>")), sv => struct(
      when(sv.getField("type") === "CVSS_V3", "cvssv3.1")
        .when(sv.getField("type") === "CVSS_V2", "cvssv2")
        .otherwise(lower(sv.getField("type"))).as("scoring_system"),
      sv.getField("score").as("value"),
      sv.getField("score").as("scoring_elements"),
      lit("").as("url")))

    val affected = transform(coalesce(col("affected"),
      array().cast(osvSchema("affected").dataType.simpleString)), a => {
      val eco = lower(coalesce(a.getField("package").getField("ecosystem"),
        lit("generic")))
      val scheme = schemeFor(eco)
      val aff = affectingConstraints(a)
      val fix = fixedConstraints(a)
      struct(
        coalesce(a.getField("package").getField("purl"),
          concat(lit("pkg:"), eco, lit("/"),
            a.getField("package").getField("name"))).as("purl"),
        concat(lit("vers:"), scheme, lit("/"),
          when(size(aff) > 0, array_join(aff, "|")).otherwise(lit("*")))
          .as("affecting_vers"),
        concat(lit("vers:"), scheme, lit("/"), array_join(fix, "|"))
          .as("fixed_vers"))
    })

    o.select(
      col("datasource_id"),
      col("id").as("advisory_id"),
      coalesce(col("summary"), col("details"), lit("")).as("summary"),
      coalesce(col("aliases"), array()).as("aliases"),
      refs.as("references"),
      sevs.as("severities"),
      array().cast("array<int>").as("weaknesses"),
      affected.as("affected"),
      coalesce(to_timestamp(col("modified")),
        to_timestamp(col("published")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("published")).as("date_published"),
      concat(lit("https://osv.dev/vulnerability/"), col("id")).as("url"),
      lit(precedence).as("precedence"))
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }

  /** Read an OSV directory tree (one JSON per file) — S1's git-checkout
    * scan: wholetext keeps one advisory per row. */
  def readTree(spark: SparkSession, path: String, datasourceId: String): Dataset[AdvisoryRow] = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("json"), lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }
}
