package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Ssvc
import graft.model._

/** CISA vulnrichment ingestion (S2): CVE JSON 5.x records enriched with
  * ADP metrics — CVSS vectors of every generation plus SSVC decision
  * trees (pipelines/v2_importers/vulnrichment_importer.py:30-210).
  *
  * One `from_json` over the CVE 5.x subset; CVSS severities map
  * declaratively, the SSVC "other" metric runs the ssvc_calculator
  * equivalent ([[Ssvc.calculator]]) in a tiny UDF over the exploded
  * options list.
  */
object VulnrichmentIngest {

  private val CvssMetric = StructType(Seq(
    StructField("vectorString", StringType),
    StructField("baseScore", DoubleType)))
  private val MetricType = StructType(Seq(
    StructField("cvssV4_0", CvssMetric),
    StructField("cvssV3_1", CvssMetric),
    StructField("cvssV3_0", CvssMetric),
    StructField("cvssV2_0", CvssMetric),
    StructField("other", StructType(Seq(
      StructField("type", StringType),
      StructField("content", StructType(Seq(
        StructField("options", ArrayType(MapType(StringType, StringType))),
        StructField("timestamp", StringType)))))))))
  private val CnaType = StructType(Seq(
    StructField("descriptions", ArrayType(StructType(Seq(
      StructField("lang", StringType),
      StructField("value", StringType))))),
    StructField("metrics", ArrayType(MetricType)),
    StructField("affected", ArrayType(StructType(Seq(
      StructField("cpes", ArrayType(StringType)))))),
    StructField("references", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("tags", ArrayType(StringType)))))),
    StructField("problemTypes", ArrayType(StructType(Seq(
      StructField("descriptions", ArrayType(StructType(Seq(
        StructField("cweId", StringType),
        StructField("description", StringType)))))))))))

  val cveSchema: StructType = StructType(Seq(
    StructField("cveMetadata", StructType(Seq(
      StructField("cveId", StringType),
      StructField("state", StringType),
      StructField("datePublished", StringType)))),
    StructField("containers", StructType(Seq(
      StructField("cna", CnaType),
      StructField("adp", ArrayType(StructType(Seq(
        StructField("metrics", ArrayType(MetricType)))))))))))

  /** (options, timestamp) → struct(vector, decision) via Ssvc.calculator;
    * timestamps truncate to whole seconds like the reference's strftime. */
  private val ssvcCalcUdf = udf(
    (options: Seq[Map[String, String]], timestamp: String) => {
      val opts = Option(options).getOrElse(Seq.empty)
        .flatMap(m => Option(m).getOrElse(Map.empty).headOption)
      val ts = Option(timestamp).flatMap { t =>
        try Some(java.time.OffsetDateTime.parse(t)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")))
        catch { case _: Exception => None }
      }
      Ssvc.calculator(opts, ts).map { case (vector, decision) =>
        (vector, decision)
      }.orNull
    })

  private val RefTypeByTag = Map(
    "exploit" -> "exploit", "issue-tracking" -> "bug",
    "mailing-list" -> "mailing_list", "third-party-advisory" -> "advisory",
    "vendor-advisory" -> "advisory", "vdb-entry" -> "advisory")

  /** Mapped reference type for one tag, null when the tag is unmapped. */
  private def refTypeForTag(tag: Column): Column =
    RefTypeByTag.foldLeft(lit(null).cast("string")) {
      case (acc, (t, v)) => when(tag === t, v).otherwise(acc)
    }

  /** Parse a DataFrame of raw CVE 5.x JSON strings (columns
    * `datasource_id`, `json`, optional `path`). */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 100): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val withPath = if (raw.columns.contains("path")) raw
      else raw.withColumn("path", lit(""))
    val o = withPath.withColumn("cve", from_json(col("json"), cveSchema))
      .select(col("datasource_id"), col("path"), col("cve.*"))
      .filter(col("cveMetadata.cveId").isNotNull)

    val advUrl = when(length(col("path")) > 0,
      concat(lit("https://github.com/cisagov/vulnrichment/blob/develop/"),
        regexp_extract(col("path"), "([^/]+/[^/]+)$", 0)))
      .otherwise(concat(
        lit("https://github.com/cisagov/vulnrichment/"),
        col("cveMetadata.cveId")))

    val emptyMetrics = array().cast(ArrayType(MetricType))
    val adpType = ArrayType(StructType(Seq(
      StructField("metrics", ArrayType(MetricType)))))
    val metrics = concat(
      coalesce(col("containers.cna.metrics"), emptyMetrics),
      coalesce(flatten(transform(
        coalesce(col("containers.adp"), array().cast(adpType)),
        a => coalesce(a.getField("metrics"), emptyMetrics))), emptyMetrics))

    def cvssSev(m: org.apache.spark.sql.Column, field: String,
        system: String) =
      when(m.getField(field).isNotNull &&
        m.getField(field).getField("vectorString").isNotNull, struct(
        lit(system).as("scoring_system"),
        m.getField(field).getField("baseScore").cast("string").as("value"),
        m.getField(field).getField("vectorString").as("scoring_elements"),
        lit("").as("url")))

    val withMetrics = o.withColumn("all_metrics", metrics)
    val cvssSevs = flatten(transform(col("all_metrics"), m =>
      filter(array(
        cvssSev(m, "cvssV4_0", "cvssv4"),
        cvssSev(m, "cvssV3_1", "cvssv3.1"),
        cvssSev(m, "cvssV3_0", "cvssv3"),
        cvssSev(m, "cvssV2_0", "cvssv2")), s => s.isNotNull)))
    val ssvcSevs = transform(
      filter(col("all_metrics"), m =>
        m.getField("other").isNotNull &&
          m.getField("other").getField("type") === "ssvc"),
      m => ssvcCalcUdf(
        m.getField("other").getField("content").getField("options"),
        m.getField("other").getField("content").getField("timestamp")))
    val ssvcRows = transform(filter(ssvcSevs, s => s.isNotNull), s => struct(
      lit("ssvc").as("scoring_system"),
      s.getField("_2").as("value"),
      s.getField("_1").as("scoring_elements"),
      lit("").as("url")))

    val refs = transform(coalesce(col("containers.cna.references"),
      array().cast("array<struct<url:string,tags:array<string>>>")),
      r => struct(
        r.getField("url").as("url"),
        // The reference loops the record's tags IN DATA ORDER with the
        // last mapped tag winning (vulnrichment_importer.py:161-163), so
        // fold over the tags array itself — a fixed tag-precedence fold
        // would disagree on records carrying several mapped tags (e.g.
        // ['vendor-advisory', 'exploit']).
        coalesce(
          aggregate(
            coalesce(r.getField("tags"), array().cast("array<string>")),
            lit(null).cast("string"),
            (acc, tag) => coalesce(refTypeForTag(tag), acc)),
          lit("other")).as("reference_type"),
        regexp_extract(r.getField("url"), "[^/]+$", 0).as("reference_id")))
    val cpeRefs = transform(array_sort(array_distinct(
      flatten(transform(coalesce(col("containers.cna.affected"),
        array().cast("array<struct<cpes:array<string>>>")),
        a => coalesce(a.getField("cpes"), array().cast("array<string>")))))),
      cpe => struct(
        concat(lit("https://nvd.nist.gov/vuln/search/results?" +
          "adv_search=true&isCpeNameSearch=true&query="), cpe).as("url"),
        lit("other").as("reference_type"),
        cpe.as("reference_id")))

    // The reference adds BOTH the cweId-derived and the description-
    // derived CWE per problemType description (vulnrichment_importer.py:
    // 184-197) — emit both into the flattened set instead of coalescing.
    // regexp_extract returns '' (not null) on a non-matching non-null
    // input (e.g. cweId = 'NVD-CWE-noinfo'), so empties are nulled out
    // before the int cast rather than short-circuiting a coalesce.
    def cweNum(c: Column): Column = {
      val digits = regexp_extract(c, "CWE-(\\d+)", 1)
      when(digits === "", lit(null)).otherwise(digits).cast("int")
    }
    val weaknesses = array_sort(array_distinct(filter(flatten(transform(
      coalesce(col("containers.cna.problemTypes"),
        array().cast(CnaType("problemTypes").dataType.simpleString)),
      pt => flatten(transform(coalesce(pt.getField("descriptions"),
        array().cast(
          "array<struct<cweId:string,description:string>>")),
        d => array(cweNum(d.getField("cweId")),
          cweNum(d.getField("description"))))))), w => w.isNotNull)))

    val summary = try_element_at(filter(
      coalesce(col("containers.cna.descriptions"),
        array().cast("array<struct<lang:string,value:string>>")),
      d => d.getField("lang").isin("en", "en-US")), lit(-1))

    withMetrics.select(
      col("datasource_id"),
      col("cveMetadata.cveId").as("advisory_id"),
      coalesce(summary.getField("value"), lit("")).as("summary"),
      array().cast("array<string>").as("aliases"),
      concat(refs, cpeRefs).as("references"),
      concat(cvssSevs, ssvcRows).as("severities"),
      weaknesses.as("weaknesses"),
      array().cast(
        "array<struct<purl:string,affecting_vers:string,fixed_vers:string>>")
        .as("affected"),
      coalesce(to_timestamp(col("cveMetadata.datePublished")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("cveMetadata.datePublished")).as("date_published"),
      advUrl.as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
