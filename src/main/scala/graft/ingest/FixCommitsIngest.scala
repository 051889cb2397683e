package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** VCS fix-commit collection (S2): the reference registers ~37 pipelines
  * that are ONE operator parameterized by repository — scan every commit
  * message for CVE/GHSA ids and emit one advisory per vulnerability id
  * with its fixing commits (pipes/vcs_collector_utils.py:31-150,
  * v2_importers/collect_fix_commits.py). Here that operator is one Spark
  * job over a commit-log table (the clone + `git log` dump is the
  * driver-side ingestion boundary, exactly like the reference's clone
  * step), and [[Projects]] carries the same per-repo registry.
  */
object FixCommitsIngest {

  /** Same match patterns as the reference (vcs_collector_utils.py:40-43). */
  val Patterns: Seq[String] = Seq(
    "(?i)\\bCVE-\\d{4}-\\d{4,19}\\b",
    "(?i)GHSA-[2-9cfghjmpqrvwx]{4}-[2-9cfghjmpqrvwx]{4}-[2-9cfghjmpqrvwx]{4}")

  /** pipeline_id → (datasource_id, repo_url), transcribed from
    * collect_fix_commits.py (public per-project configuration). */
  val Projects: Map[String, (String, String)] = Map(
    "collect_linux_fix_commits" -> ("linux_fix_commits", "https://github.com/torvalds/linux"),
    "collect_busybox_fix_commits" -> ("busybox_fix_commits", "https://github.com/mirror/busybox"),
    "collect_nginx_fix_commits" -> ("nginx_fix_commits", "https://github.com/nginx/nginx"),
    "collect_apache_tomcat_fix_commits" -> ("apache_tomcat_fix_commits", "https://github.com/apache/tomcat"),
    "collect_mysql_server_fix_commits" -> ("mysql_server_fix_commits", "https://github.com/mysql/mysql-server"),
    "collect_postgresql_fix_commits" -> ("postgresql_fix_commits", "https://github.com/postgres/postgres"),
    "collect_mongodb_fix_commits" -> ("mongodb_fix_commits", "https://github.com/mongodb/mongo"),
    "collect_redis_fix_commits" -> ("redis_fix_commits", "https://github.com/redis/redis"),
    "collect_sqlite_fix_commits" -> ("sqlite_fix_commits", "https://github.com/sqlite/sqlite"),
    "collect_php_fix_commits" -> ("php_fix_commits", "https://github.com/php/php-src"),
    "collect_python_cpython_fix_commits" -> ("python_cpython_fix_commits", "https://github.com/python/cpython"),
    "collect_ruby_fix_commits" -> ("ruby_fix_commits", "https://github.com/ruby/ruby"),
    "collect_go_fix_commits" -> ("go_fix_commits", "https://github.com/golang/go"),
    "collect_node_js_fix_commits" -> ("node_js_fix_commits", "https://github.com/nodejs/node"),
    "collect_rust_fix_commits" -> ("rust_fix_commits", "https://github.com/rust-lang/rust"),
    "collect_openjdk_fix_commits" -> ("openjdk_fix_commits", "https://github.com/openjdk/jdk"),
    "collect_swift_fix_commits" -> ("swift_fix_commits", "https://github.com/swiftlang/swift"),
    "collect_django_fix_commits" -> ("django_fix_commits", "https://github.com/django/django"),
    "collect_rails_fix_commits" -> ("rails_fix_commits", "https://github.com/rails/rails"),
    "collect_laravel_fix_commits" -> ("laravel_fix_commits", "https://github.com/laravel/framework"),
    "collect_spring_framework_fix_commits" -> ("spring_framework_fix_commits", "https://github.com/spring-projects/spring-framework"),
    "collect_react_fix_commits" -> ("react_fix_commits", "https://github.com/facebook/react"),
    "collect_angular_fix_commits" -> ("angular_fix_commits", "https://github.com/angular/angular"),
    "collect_wordpress_fix_commits" -> ("wordpress_fix_commits", "https://github.com/WordPress/WordPress"),
    "collect_docker_moby_fix_commits" -> ("docker_moby_fix_commits", "https://github.com/moby/moby"),
    "collect_kubernetes_fix_commits" -> ("kubernetes_fix_commits", "https://github.com/kubernetes/kubernetes"),
    "collect_qemu_fix_commits" -> ("qemu_fix_commits", "https://gitlab.com/qemu-project/qemu"),
    "collect_xen_project_fix_commits" -> ("xen_project_fix_commits", "https://github.com/xen-project/xen"),
    "collect_virtualbox_fix_commits" -> ("virtualbox_fix_commits", "https://github.com/mirror/vbox"),
    "collect_containerd_fix_commits" -> ("containerd_fix_commits", "https://github.com/containerd/containerd"),
    "collect_ansible_fix_commits" -> ("ansible_fix_commits", "https://github.com/ansible/ansible"),
    "collect_terraform_fix_commits" -> ("terraform_fix_commits", "https://github.com/hashicorp/terraform"),
    "collect_wireshark_fix_commits" -> ("wireshark_fix_commits", "https://gitlab.com/wireshark/wireshark"),
    "collect_tcpdump_fix_commits" -> ("tcpdump_fix_commits", "https://github.com/the-tcpdump-group/tcpdump"),
    "collect_git_fix_commits" -> ("git_fix_commits", "https://github.com/git/git"),
    "collect_jenkins_fix_commits" -> ("jenkins_fix_commits", "https://github.com/jenkinsci/jenkins"),
    "collect_gitlab_fix_commits" -> ("gitlab_fix_commits", "https://gitlab.com/gitlab-org/gitlab-foss"))

  /** repo url → base purl (url2purl subset for github/gitlab hosts). */
  def purlForRepo(repoUrl: String): Option[String] = {
    val m = "https://(github\\.com|gitlab\\.com)/([^/]+)/([^/]+)/?$".r
      .findFirstMatchIn(repoUrl)
    m.map { g =>
      val ptype = if (g.group(1) == "github.com") "github" else "gitlab"
      s"pkg:$ptype/${g.group(2).toLowerCase}/${g.group(3).toLowerCase}"
    }
  }

  /** Commit reference url, purl2url-style: the reference renders the
    * reference URL via `purl2url(PackageURL(type, ns, name,
    * version=commit_hash))` (vcs_collector_utils.py:129-141), which for
    * github yields `https://github.com/{ns}/{name}/tree/{hash}` and for
    * gitlab `https://gitlab.com/{ns}/{name}/-/tree/{hash}` — proven by
    * the captured golden (test_data/fix_commits/
    * expected_linux_advisory_output.json: ".../tree/41b43c…"). purl
    * types purl2url can't render get NO reference (`if not ref_url:
    * continue`, :136-137) — None here mirrors that. */
  def commitRefUrl(repoUrl: String): Option[String] =
    "https://(github\\.com|gitlab\\.com)/([^/]+)/([^/]+)/?$".r
      .findFirstMatchIn(repoUrl).map { g =>
        val path = s"${g.group(2).toLowerCase}/${g.group(3).toLowerCase}"
        if (g.group(1) == "github.com")
          s"https://github.com/$path/tree/"
        else s"https://gitlab.com/$path/-/tree/"
      }

  /** One advisory per vulnerability id found in commit messages.
    *
    * `commits`: (commit_hash, message) — the repo's log dump. The grouping
    * shuffles on the extracted vulnerability id; commit sets are sorted so
    * output is deterministic regardless of log order (the reference
    * inherits git iteration order — summary line order is the one
    * deliberate difference).
    */
  /** (commit_hash, message) → one (vuln_id, commit_hash, message) row
    * per vulnerability id mentioned in the message (the
    * extract_vulnerability_id + grouping scan,
    * vcs_collector_utils.py:66-98). */
  def extractVulnIds(commits: DataFrame): DataFrame = commits
    .select(col("commit_hash"), col("message"),
      array_distinct(concat(
        transform(regexp_extract_all(col("message"),
          lit(Patterns.head), lit(0)), upper _),
        // GHSA ids are canonically "GHSA-" + lowercase groups —
        // uppercasing them (as CVEs are) produced ids that never
        // matched the GithubIngest ghsaId for the same advisory
        transform(regexp_extract_all(col("message"),
          lit(Patterns(1)), lit(0)),
          m => concat(lit("GHSA-"),
            lower(substring(m, 6, 1000)))))).as("vuln_ids"))
    .filter(size(col("vuln_ids")) > 0)
    .select(explode(col("vuln_ids")).as("vuln_id"),
      col("commit_hash"), col("message"))

  def fromCommits(spark: SparkSession, commits: DataFrame, repoUrl: String,
      datasourceId: String, precedence: Int = 5): Dataset[AdvisoryRow] =
    fromGrouped(spark, extractVulnIds(commits), repoUrl, datasourceId,
      precedence)

  /** The grouped→advisory tail of the pipeline, from pre-extracted
    * (vuln_id, commit_hash, message) rows — the stage the reference's
    * captured golden exercises (collect_advisories over a mocked
    * collect_fix_commits, test_collect_fix_commit.py:76-88). */
  def fromGrouped(spark: SparkSession, matched: DataFrame, repoUrl: String,
      datasourceId: String, precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val purl = purlForRepo(repoUrl)
      .getOrElse(s"pkg:generic/${repoUrl.replaceAll("^https?://", "")}")
    val refBase = commitRefUrl(repoUrl)
    matched
      .groupBy("vuln_id")
      .agg(array_sort(collect_set(struct(col("commit_hash"),
        col("message")))).as("commits"))
      .select(
        lit(datasourceId).as("datasource_id"),
        col("vuln_id").as("advisory_id"),
        array_join(transform(col("commits"), c =>
          concat(c.getField("commit_hash"), lit(":"),
            c.getField("message"))), "\n").as("summary"),
        array().cast("array<string>").as("aliases"),
        refBase.map(base => transform(col("commits"), c => struct(
          concat(lit(base), c.getField("commit_hash")).as("url"),
          lit("commit").as("reference_type"),
          c.getField("commit_hash").as("reference_id"))))
          .getOrElse(array().cast("array<struct<url:string," +
            "reference_type:string,reference_id:string>>"))
          .as("references"),
        array().cast(
          "array<struct<scoring_system:string,value:string," +
            "scoring_elements:string,url:string>>").as("severities"),
        array().cast("array<int>").as("weaknesses"),
        // one AffectedPackageV2 per fixing commit like the reference; the
        // commit itself travels through references + commitLinks, not a
        // version range (vcs_collector_utils.py:120-127)
        transform(col("commits"), _ => struct(
          lit(purl).as("purl"),
          lit("").as("affecting_vers"),
          lit("").as("fixed_vers"))).as("affected"),
        to_timestamp(lit("1970-01-01")).as("date_collected"),
        lit(null).cast("timestamp").as("date_published"),
        lit(repoUrl).as("url"),
        lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }

  /** Structured commit-patch links for commitPatchesFromLinks — the
    * PackageCommitPatchData rows the reference attaches
    * (vcs_collector_utils.py:120-127). */
  def commitLinks(spark: SparkSession, commits: DataFrame, repoUrl: String,
      datasourceId: String): DataFrame =
    // from the extraction directly, not the references —
    // PackageCommitPatchData rows exist even for repos whose purl
    // purl2url can't render (vcs_collector_utils.py:120-127 attaches
    // the patch before the `if not ref_url: continue` reference guard)
    extractVulnIds(commits)
      .select(concat(lit(datasourceId), lit("/"), col("vuln_id"))
        .as("avid"), lit(repoUrl).as("vcs_url"), col("commit_hash"))
      .distinct()
}
