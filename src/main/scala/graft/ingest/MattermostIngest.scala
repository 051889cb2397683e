package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Mattermost security-updates ingestion (S2): the JSON feed of update
  * records with MMSA/CVE ids, platform and fix versions
  * (pipelines/v2_importers/mattermost_importer.py:45-161). Declarative:
  * the platform→repo dimension maps to github purls; fix_versions clean
  * (v-prefix, "and ") into pins. */
object MattermostIngest {

  /** platform → mattermost repo (mattermost_importer.py:25-31). */
  val RepoByPlatform: Map[String, String] = Map(
    "Mattermost Mobile Apps" -> "mattermost-mobile",
    "Mattermost Server" -> "mattermost-server",
    "Mattermost Desktop App" -> "desktop",
    "Mattermost Boards" -> "mattermost-plugin-boards",
    "Mattermost Plugins" -> "mattermost-plugin-github")

  private val Record = StructType(Seq(
    StructField("issue_id", StringType),
    StructField("cve_id", StringType),
    StructField("details", StringType),
    StructField("platform", StringType),
    StructField("severity", StringType),
    StructField("fix_versions", ArrayType(StringType))))

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val repoDim = RepoByPlatform.toSeq.toDF("platform", "repo")
    val o = raw
      .select(col("datasource_id"),
        explode(from_json(col("json"), ArrayType(Record))).as("r"))
      .select(col("datasource_id"), col("r.*"))
      .join(broadcast(repoDim), Seq("platform"), "left")

    // parse_vuln_ids (mattermost_importer.py:140-161): MMSA/CVE tokens of
    // issue_id plus a valid cve_id; the first becomes the advisory id
    val ids = concat(
      filter(transform(split(coalesce(col("issue_id"), lit("")), ","),
        t => trim(t)), t =>
        t.startsWith("MMSA-") || t.startsWith("CVE-")),
      filter(array(trim(coalesce(col("cve_id"), lit("")))),
        c => c.rlike("^CVE-\\d{4}-\\d{4,19}$")))
    val withIds = o.withColumn("ids", ids)
      .filter(size(col("ids")) > 0)

    val fixPins = transform(filter(transform(coalesce(col("fix_versions"),
      array().cast("array<string>")),
      v => trim(regexp_replace(regexp_replace(v, "^v", ""), "and ", ""))),
      v => length(v) > 0), v => concat(lit("="), v))

    withIds.select(
      col("datasource_id"),
      try_element_at(col("ids"), lit(1)).as("advisory_id"),
      coalesce(col("details"), lit("")).as("summary"),
      slice(col("ids"), 2, 1000).as("aliases"),
      array(struct(lit("https://mattermost.com/security-updates/")
        .as("url"), lit("advisory").as("reference_type"),
        lit("").as("reference_id"))).as("references"),
      array(struct(lit("cvssv3.1_qr").as("scoring_system"),
        coalesce(col("severity"), lit("")).as("value"),
        lit("").as("scoring_elements"), lit("").as("url"))).as("severities"),
      array().cast("array<int>").as("weaknesses"),
      when(col("repo").isNotNull, array(struct(
        concat(lit("pkg:github/mattermost/"), col("repo")).as("purl"),
        lit("vers:semver/").as("affecting_vers"),
        concat(lit("vers:semver/"), array_join(fixPins, "|"))
          .as("fixed_vers"))))
        .otherwise(array().cast(
          "array<struct<purl:string,affecting_vers:string,fixed_vers:string>>"))
        .as("affected"),
      to_timestamp(lit("1970-01-01")).as("date_collected"),
      lit(null).cast("timestamp").as("date_published"),
      lit("https://mattermost.com/security-updates/").as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
