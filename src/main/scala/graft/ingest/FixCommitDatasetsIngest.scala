package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Curated fix-commit datasets (S2): three sources whose payload is
  * "vulnerability id → fixing commits" rather than advisory prose —
  * SAP project-kb MSR2019 (CSV), Quarkslab aosp_dataset (JSON per CVE),
  * and linux_kernel_cves (versioned security.txt lists). Reference:
  * pipelines/v2_importers/project_kb_msr2019_importer.py,
  * aosp_importer.py, linux_kernel_importer.py.
  */
object FixCommitDatasetsIngest {

  private def emptySevs = "array<struct<scoring_system:string," +
    "value:string,scoring_elements:string,url:string>>"

  private def purlFor(vcsUrl: org.apache.spark.sql.Column) = {
    val host = regexp_extract(vcsUrl,
      "https?://(github\\.com|gitlab\\.com)/([^/]+)/([^/]+)", 1)
    val org = regexp_extract(vcsUrl,
      "https?://(github\\.com|gitlab\\.com)/([^/]+)/([^/]+)", 2)
    val name = regexp_extract(vcsUrl,
      "https?://(github\\.com|gitlab\\.com)/([^/]+)/([^/]+)", 3)
    when(host === "github.com",
      concat(lit("pkg:github/"), lower(org), lit("/"), lower(name)))
      .when(host === "gitlab.com",
        concat(lit("pkg:gitlab/"), lower(org), lit("/"), lower(name)))
      .otherwise(concat(lit("pkg:generic/"),
        regexp_replace(vcsUrl, "^https?://", "")))
  }

  private val VcsBaseRe =
    "^(https?://(?:github\\.com|gitlab\\.com|bitbucket\\.org)/[^/]+/[^/]+)"

  private def vcsBase(u: org.apache.spark.sql.Column) =
    regexp_replace(regexp_extract(u, VcsBaseRe, 1), "\\.git$", "")

  private def fixSha(f: org.apache.spark.sql.Column) = {
    val cid = coalesce(f.getField("commitId"), lit(""))
    when(cid =!= "", cid).otherwise(regexp_extract(
      coalesce(f.getField("patchUrl"), lit("")),
      "/commit/([0-9a-f]{7,40})", 1))
  }

  /** One reference per aosp fix (see call-site comment). */
  private def aospRefs(fixes: org.apache.spark.sql.Column) =
    filter(transform(fixes, f => {
      val url = coalesce(f.getField("patchUrl"), lit(""))
      val base = vcsBase(url)
      val sha = fixSha(f)
      val cid = coalesce(f.getField("commitId"), lit(""))
      when(base =!= "" && sha =!= "", struct(
        base.as("url"), lit("fix_commit").as("reference_type"),
        sha.as("reference_id")))
        .when(cid =!= "" && url =!= "", struct(
          url.as("url"), lit("commit").as("reference_type"),
          cid.as("reference_id")))
        .when(url =!= "", struct(url.as("url"),
          lit("patch").as("reference_type"), lit("").as("reference_id")))
    }), x => x.isNotNull)

  /** Packages derived from supported-VCS fix urls. */
  private def aospPackages(fixes: org.apache.spark.sql.Column) =
    transform(array_distinct(filter(transform(fixes, f =>
      when(fixSha(f) =!= "", vcsBase(coalesce(f.getField("patchUrl"),
        lit("")))).otherwise(lit(""))), b => b =!= "")),
      base => struct(
        purlFor(base).as("purl"),
        lit("").as("affecting_vers"), lit("").as("fixed_vers")))

  /** project-kb MSR2019 release CSV: (vuln_id, vcs_url, commit_hash, poc)
    * rows → one advisory per vulnerability with its commit references. */
  def projectKbMsr2019(spark: SparkSession, path: String,
      datasourceId: String = "project_kb_msr2019"): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("vuln_id", StringType), StructField("vcs_url", StringType),
      StructField("commit_hash", StringType), StructField("poc", StringType)))
    val feedUrl = "https://github.com/SAP/project-kb/blob/main/MSR2019/" +
      "dataset/vulas_db_msr2019_release.csv"
    spark.read.option("header", "true").schema(schema).csv(path)
      .filter(col("vuln_id").isNotNull && col("vcs_url").isNotNull &&
        col("commit_hash").isNotNull)
      .dropDuplicates("vuln_id", "vcs_url", "commit_hash")
      .groupBy("vuln_id")
      .agg(array_sort(collect_set(struct(col("vcs_url"),
        col("commit_hash")))).as("commits"))
      .select(
        lit(datasourceId).as("datasource_id"),
        col("vuln_id").as("advisory_id"),
        lit("").as("summary"),
        array().cast("array<string>").as("aliases"),
        // directed fix-commit references — the flat analog of the
        // reference's fixed_by_commit_patches (vcs_url + hash, captured
        // kbmsr2019-expected)
        transform(col("commits"), c => struct(
          c.getField("vcs_url").as("url"),
          lit("fix_commit").as("reference_type"),
          c.getField("commit_hash").as("reference_id"))).as("references"),
        array().cast(emptySevs).as("severities"),
        array().cast("array<int>").as("weaknesses"),
        transform(col("commits"), c => struct(
          purlFor(c.getField("vcs_url")).as("purl"),
          lit("").as("affecting_vers"),
          lit("").as("fixed_vers"))).as("affected"),
        to_timestamp(lit("1970-01-01")).as("date_collected"),
        lit(null).cast("timestamp").as("date_published"),
        lit(feedUrl).as("url"),
        lit(200).as("precedence"))
      .as[AdvisoryRow]
  }

  /** aosp_dataset: one JSON per CVE file with comma-separable cveId,
    * vulnerabilityType summary, generic severity and fixes[] commits. */
  def aosp(spark: SparkSession, raw: DataFrame,
      precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("cveId", StringType),
      StructField("vulnerabilityType", StringType),
      StructField("severity", StringType),
      StructField("dateReported", StringType),
      StructField("fixes", ArrayType(StructType(Seq(
        StructField("patchUrl", StringType),
        StructField("commitId", StringType)))))))
    raw.withColumn("d", from_json(col("json"), schema))
      .select(col("datasource_id"), col("path"), col("d.*"))
      .select(col("datasource_id"), col("path"),
        explode(split(coalesce(col("cveId"), lit("")), ",")).as("vuln_id"),
        col("vulnerabilityType"), col("severity"), col("dateReported"),
        col("fixes"))
      .filter(length(trim(col("vuln_id"))) > 0)
      .select(
        col("datasource_id"),
        trim(col("vuln_id")).as("advisory_id"),
        coalesce(col("vulnerabilityType"), lit("")).as("summary"),
        array().cast("array<string>").as("aliases"),
        // classify_patch_source semantics (advisory.py:206-250, captured
        // aosp expected): supported-VCS url → directed fix_commit (base
        // repo url + sha from commitId or the /commit/ path) plus a
        // repo-derived package; other url with a commit id → plain
        // commit reference; other url without one → patch data
        aospRefs(coalesce(col("fixes"), array().cast(
          "array<struct<patchUrl:string,commitId:string>>")))
          .as("references"),
        when(col("severity").isNotNull, array(struct(
          lit("generic_textual").as("scoring_system"),
          col("severity").as("value"),
          lit("").as("scoring_elements"), lit("").as("url"))))
          .otherwise(array().cast(emptySevs)).as("severities"),
        array().cast("array<int>").as("weaknesses"),
        aospPackages(coalesce(col("fixes"), array().cast(
          "array<struct<patchUrl:string,commitId:string>>")))
          .as("affected"),
        coalesce(to_timestamp(col("dateReported")),
          to_timestamp(lit("1970-01-01"))).as("date_collected"),
        to_timestamp(col("dateReported")).as("date_published"),
        concat(lit("https://raw.githubusercontent.com/quarkslab/" +
          "aosp_dataset/refs/heads/master/cves/"),
          regexp_extract(col("path"), "([^/]+)$", 1)).as("url"),
        lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }

  /** linux_kernel_cves security.txt: "CVEs fixed in <v>:" headers then
    * "CVE-…: <sha>" lines → advisory per CVE with kernel commit links and
    * the fixed version pin. The stateful header scan runs per file. */
  def linuxKernelCves(spark: SparkSession, raw: DataFrame,
      datasourceId: String = "linux_kernel"): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val cveRe = "CVE-\\d{4}-\\d{4,19}".r
    val shaRe = "[0-9a-f]{12,40}".r
    val rows = raw.select("text").as[String].flatMap { text =>
      var fixedVersion: String = null
      text.split('\n').toSeq.flatMap { line0 =>
        val line = line0.trim
        if (line.isEmpty) None
        else if (line.startsWith("CVEs fixed in")) {
          fixedVersion = line.stripPrefix("CVEs fixed in").trim
            .stripSuffix(":")
          None
        } else {
          val parts = line.split(":", 3)
          if (parts.length < 2) None
          else for {
            cve <- cveRe.findFirstIn(parts(0))
            sha <- shaRe.findFirstIn(parts(1))
          } yield (cve,
            // generic-version padding: 3.12 → 3.12.0 (captured
            // linux_kernel expected)
            GlibcIngest.genericVersion(Option(fixedVersion).getOrElse("")),
            sha)
        }
      }
    }.toDF("vuln_id", "fixed_version", "commit_hash")
    rows.groupBy("vuln_id")
      .agg(array_sort(collect_set(struct(col("fixed_version"),
        col("commit_hash")))).as("fixes"))
      .select(
        lit(datasourceId).as("datasource_id"),
        col("vuln_id").as("advisory_id"),
        lit("").as("summary"),
        array().cast("array<string>").as("aliases"),
        transform(col("fixes"), f => struct(
          lit("https://github.com/torvalds/linux").as("url"),
          lit("fix_commit").as("reference_type"),
          f.getField("commit_hash").as("reference_id"))).as("references"),
        array().cast(emptySevs).as("severities"),
        array().cast("array<int>").as("weaknesses"),
        transform(col("fixes"), f => struct(
          lit("pkg:github/torvalds/linux").as("purl"),
          lit("").as("affecting_vers"),
          when(length(f.getField("fixed_version")) > 0,
            concat(lit("vers:generic/="), f.getField("fixed_version")))
            .otherwise(lit("")).as("fixed_vers"))).as("affected"),
        to_timestamp(lit("1970-01-01")).as("date_collected"),
        lit(null).cast("timestamp").as("date_published"),
        lit("https://github.com/nluedtke/linux_kernel_cves").as("url"),
        lit(200).as("precedence"))
      .as[AdvisoryRow]
  }
}
