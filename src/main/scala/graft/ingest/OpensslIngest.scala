package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** OpenSSL security advisories ingestion (S2): the project's secjson
  * CVE 5.x records (pipelines/v2_importers/openssl_importer.py:62-160,
  * pipes/openssl.py:22-99). Declarative `from_json`: per-version rows
  * translate (version, lessThan, lessThanOrEqual) into openssl-scheme
  * constraints, references classify commit/advisory by name and tag. */
object OpensslIngest {

  private val VersionRow = StructType(Seq(
    StructField("version", StringType),
    StructField("lessThan", StringType),
    StructField("lessThanOrEqual", StringType),
    StructField("status", StringType)))
  private val LangValue = StructType(Seq(
    StructField("lang", StringType),
    StructField("value", StringType)))
  private val RefRow = StructType(Seq(
    StructField("name", StringType),
    StructField("url", StringType),
    StructField("tags", ArrayType(StringType))))
  private val MetricRow = StructType(Seq(
    StructField("other", StructType(Seq(
      StructField("content", StructType(Seq(
        StructField("text", StringType)))))))))
  private val AffectedRowT = StructType(Seq(
    StructField("versions", ArrayType(VersionRow))))
  private val ProblemType = StructType(Seq(
    StructField("descriptions", ArrayType(StructType(Seq(
      StructField("cweId", StringType)))))))
  private val CnaType = StructType(Seq(
    StructField("title", StringType),
    StructField("datePublic", StringType),
    StructField("descriptions", ArrayType(LangValue)),
    StructField("metrics", ArrayType(MetricRow)),
    StructField("problemTypes", ArrayType(ProblemType)),
    StructField("references", ArrayType(RefRow)),
    StructField("affected", ArrayType(AffectedRowT))))
  val schema: StructType = StructType(Seq(
    StructField("cveMetadata", StructType(Seq(
      StructField("cveId", StringType)))),
    StructField("containers", StructType(Seq(
      StructField("cna", CnaType))))))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("c", from_json(col("json"), schema))
      .select(col("datasource_id"),
        col("c.cveMetadata.cveId").as("cve"),
        col("c.containers.cna.*"))
      .filter(col("cve").isNotNull)

    // build_description(title, description) (openssl_importer.py:167)
    val descr = trim(coalesce(
      try_element_at(col("descriptions"), lit(1)).getField("value"),
      lit("")))
    val title = trim(coalesce(col("title"), lit("")))
    val summary =
      when(descr === "", title)
        .when(title =!= "" && !descr.contains(title),
          concat(title, lit("\n"), descr))
        .otherwise(descr)
    val sevText = try_element_at(col("metrics"), lit(1))
      .getField("other").getField("content").getField("text")
    // the project's own severity scale is its own scoring system
    // (captured expected: system "openssl", openssl_importer.py)
    val sevs = when(sevText.isNotNull, array(struct(
      lit("openssl").as("scoring_system"), sevText.as("value"),
      lit("").as("scoring_elements"), lit("").as("url"))))
      .otherwise(array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>"))

    val rawRefs = filter(coalesce(col("references"),
      array().cast(
        "array<struct<name:string,url:string,tags:array<string>>>")),
      r => r.getField("url").isNotNull)
    val refs = transform(rawRefs, r => {
      val name = lower(coalesce(r.getField("name"), lit("")))
      val tag = lower(coalesce(try_element_at(coalesce(r.getField("tags"),
        array().cast("array<string>")), lit(1)), lit("")))
      struct(
        r.getField("url").as("url"),
        when(name.contains("commit") || tag === "patch", "commit")
          .when(name.contains("advisory"), "advisory")
          .otherwise("other").as("reference_type"),
        coalesce(r.getField("name"), tag).as("reference_id"))
    })
    // tag=patch references split on having a name
    // (openssl_importer.py:95-105): unnamed -> a PatchData (our
    // type=patch reference); named ("0.9.8n git commit") -> a fixed-by
    // commit patch against the canonical GitHub mirror, sha from the
    // gitweb `h=` or `/commit/` url (captured CVE-2010-0433 vs
    // CVE-2022-3996)
    val commitPatchRefs = filter(transform(rawRefs, r => {
      val tag = lower(coalesce(try_element_at(coalesce(r.getField("tags"),
        array().cast("array<string>")), lit(1)), lit("")))
      val sha = when(
        regexp_extract(r.getField("url"), "[;&]h=([0-9a-f]{7,40})", 1)
          =!= "",
        regexp_extract(r.getField("url"), "[;&]h=([0-9a-f]{7,40})", 1))
        .otherwise(regexp_extract(r.getField("url"),
          "/commit/([0-9a-f]{7,40})", 1))
      when(tag === "patch" && r.getField("name").isNull, struct(
        r.getField("url").as("url"),
        lit("patch").as("reference_type"),
        lit("").as("reference_id")))
        .when(tag === "patch" && sha =!= "", struct(
          lit("https://github.com/openssl/openssl/").as("url"),
          lit("fix_commit").as("reference_type"),
          sha.as("reference_id")))
    }), x => x.isNotNull)

    // pipes/openssl.py:22-52: lessThan -> <x with fixed=x; lessThanOrEqual
    // -> <=x; the lower bound is = when alone, >= with an upper bound
    val versions = filter(flatten(transform(coalesce(col("affected"),
      array().cast(ArrayType(AffectedRowT))),
      a => coalesce(a.getField("versions"), array().cast(
        ArrayType(VersionRow))))),
      v => v.getField("status") === "affected" &&
        v.getField("version").isNotNull)
    val affected = transform(versions, v => {
      val lower = v.getField("version")
      val lt = v.getField("lessThan")
      val lte = v.getField("lessThanOrEqual")
      val cons =
        when(lt.isNotNull, concat(lit(">="), lower, lit("|<"), lt))
          .when(lte.isNotNull, concat(lit(">="), lower, lit("|<="), lte))
          .otherwise(concat(lit("="), lower))
      struct(
        lit("pkg:openssl/openssl").as("purl"),
        concat(lit("vers:openssl/"), cons).as("affecting_vers"),
        concat(lit("vers:openssl/"),
          when(lt.isNotNull, concat(lit("="), lt)).otherwise(lit("")))
          .as("fixed_vers"))
    })

    o.select(
      col("datasource_id"),
      col("cve").as("advisory_id"),
      summary.as("summary"),
      array().cast("array<string>").as("aliases"),
      concat(refs, commitPatchRefs).as("references"),
      sevs.as("severities"),
      // problemTypes[0].descriptions[0].cweId (openssl_importer.py:159)
      filter(array(
        when(try_element_at(try_element_at(col("problemTypes"), lit(1))
          .getField("descriptions"), lit(1)).getField("cweId")
          .rlike("CWE-\\d+"),
          regexp_extract(try_element_at(
            try_element_at(col("problemTypes"), lit(1))
              .getField("descriptions"), lit(1)).getField("cweId"),
            "CWE-(\\d+)", 1).cast("int"))),
        w => w.isNotNull).as("weaknesses"),
      affected.as("affected"),
      coalesce(to_timestamp(col("datePublic")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("datePublic")).as("date_published"),
      concat(
        lit("https://github.com/openssl/release-metadata/blob/main/secjson/"),
        col("cve"), lit(".json")).as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
