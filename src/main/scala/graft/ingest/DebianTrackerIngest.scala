package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.model.AdvisoryRow

/** Debian security-tracker JSON ingestion (SURVEY S2; reference
  * importers/debian.py): the feed is a nested map
  * `{package: {CVE-id: {description, scope, releases: {release:
  * {status, fixed_version, urgency}}}}}` — parsed with map types and
  * exploded into one AdvisoryRow per (package, CVE).
  */
object DebianTrackerIngest {

  private val trackerSchema = MapType(StringType,
    MapType(StringType, org.apache.spark.sql.types.StructType.fromDDL(
      """description STRING, scope STRING,
        |releases MAP<STRING, STRUCT<status: STRING, fixed_version: STRING,
        |                            urgency: STRING>>""".stripMargin)))

  def parse(spark: SparkSession, raw: DataFrame,
      collectedAt: String = "1970-01-01"): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val entries = raw
      .withColumn("m", from_json(col("json"), trackerSchema))
      .select(col("datasource_id"), explode(col("m")).as(Seq("pkg", "cves")))
      .select(col("datasource_id"), col("pkg"),
        explode(col("cves")).as(Seq("cve", "d")))
    entries.select(
      col("datasource_id"),
      concat(col("cve"), lit("/"), col("pkg")).as("advisory_id"),
      coalesce(col("d.description"), lit("")).as("summary"),
      array(col("cve")).as("aliases"),
      array().cast(
        "array<struct<url:string,reference_type:string,reference_id:string>>")
        .as("references"),
      expr("""transform(filter(map_entries(coalesce(d.releases, map())),
             |  e -> e.value.urgency IS NOT NULL),
             |  e -> struct('generic_textual' AS scoring_system,
             |    e.value.urgency AS value, '' AS scoring_elements,
             |    '' AS url))""".stripMargin).as("severities"),
      array().cast("array<int>").as("weaknesses"),
      // fixed_version "0" + status "resolved" is the tracker's "never
      // affected in this release" marker (the package entered the
      // archive already fixed) — it must yield NO impact row, not the
      // all-versions range: mapping it to 'vers:deb/*' inverted the
      // feed's meaning and reported every version of an unaffected
      // package as vulnerable. An OPEN entry (whatever its
      // fixed_version) is genuinely unfixed → all versions affected.
      expr("""transform(
             |  filter(map_entries(coalesce(d.releases, map())),
             |    e -> NOT (e.value.status = 'resolved'
             |              AND e.value.fixed_version = '0')),
             |  e ->
             |  struct(concat('pkg:deb/debian/', pkg) AS purl,
             |    CASE WHEN e.value.fixed_version IS NOT NULL
             |           AND e.value.fixed_version != '0'
             |      THEN concat('vers:deb/<', e.value.fixed_version)
             |      ELSE 'vers:deb/*' END AS affecting_vers,
             |    CASE WHEN e.value.fixed_version IS NOT NULL
             |           AND e.value.fixed_version != '0'
             |      THEN concat('vers:deb/=', e.value.fixed_version)
             |      ELSE 'vers:deb/' END AS fixed_vers))""".stripMargin)
        .as("affected"),
      to_timestamp(lit(collectedAt)).as("date_collected"),
      lit(null).cast("timestamp").as("date_published"),
      concat(lit("https://security-tracker.debian.org/tracker/"), col("cve"))
        .as("url"),
      lit(5).as("precedence"))
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }
}
