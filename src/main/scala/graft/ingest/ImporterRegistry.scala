package graft.ingest

/** The reference's importer registry, line for line
  * (importers/__init__.py + the pipelines/v2_importers files), mapped to the
  * Spark entry point that replaces each pipeline. This is the
  * "switch from the reference" table: look up your pipeline_id, call the
  * named reader over the fetched raw bytes (clone/HTTP fetch stays the
  * driver-side ingestion boundary in both systems).
  */
object ImporterRegistry {

  sealed trait Support { def entryPoint: String }
  /** A dedicated parser exists for this source's format. */
  final case class Dedicated(entryPoint: String) extends Support
  /** Served by a shared operator parameterized per source. */
  final case class Shared(entryPoint: String) extends Support
  /** Not implemented; the note says why (deliberate exclusions carry
    * their rationale so the registry self-documents the delta vs the
    * reference tree). */
  final case class Missing(note: String) extends Support {
    val entryPoint = ""
  }

  /** Legacy v1-only importers whose FILES still sit under the
    * reference's `importers/` but which its own active registry no
    * longer loads (`importers/__init__.py:57-…` lists neither). They
    * now have working parsers anyway — a reference user migrating an
    * OLD deployment can still replay these feeds — while this separate
    * table keeps the registry honest about the reference's own active
    * set (rust.py can no longer even import in the reference tree: it
    * depends on the deleted `package_managers` module; the ubuntu_usn
    * feed is superseded by ubuntu_osv_importer_v2). */
  val legacyV1: Map[String, (String, Support)] = Map(
    "gsd" -> ("gsd", Dedicated("GsdIngest.parse")),
    "kaybee" -> ("kaybee", Dedicated("KaybeeIngest.parse")),
    "rust" -> ("rust", Dedicated("RustIngest.parse")),
    "suse_backports" ->
      ("suse_backports", Dedicated("SuseBackportsIngest.parse")),
    "ubuntu_usn" -> ("ubuntu_usn", Dedicated("UbuntuUsnIngest.parse")))

  /** pipeline_id → (datasource_id, support). */
  val registry: Map[String, (String, Support)] = Map(
    // OSV-format family — one shared parser (importers share osv.py)
    "pypa_importer_v2" -> ("pypa", Shared("OsvIngest.readTree")),
    "pysec_importer_v2" -> ("pysec", Shared("OsvIngest.readTree")),
    "github_osv_importer_v2" -> ("github_osv", Shared("OsvIngest.readTree")),
    "ubuntu_osv_importer_v2" -> ("ubuntu_osv", Shared("OsvIngest.readTree")),
    "oss_fuzz_importer_v2" -> ("oss_fuzz", Shared("OsvIngest.readTree")),
    // dedicated format parsers
    "nvd_importer_v2" -> ("nvd", Dedicated("NvdIngest.parse")),
    "github_importer_v2" ->
      ("github", Dedicated("GithubIngest.parseVulnerabilities")),
    "debian_importer_v2" -> ("debian", Dedicated("DebianTrackerIngest.parse")),
    "gitlab_importer_v2" -> ("gitlab", Dedicated("GitlabIngest.parse")),
    "redhat_importer_v2" -> ("redhat", Dedicated("RedhatIngest.parse")),
    "alpine_linux_importer_v2" -> ("alpine_linux", Dedicated("AlpineIngest.parse")),
    "nginx_importer_v2" -> ("nginx", Dedicated("NginxIngest.parse")),
    "vulnrichment_importer_v2" -> ("vulnrichment", Dedicated("VulnrichmentIngest.parse")),
    "suse_importer_v2" -> ("suse_score", Dedicated("SuseScoreIngest.parse")),
    "curl_importer_v2" -> ("curl", Dedicated("CurlIngest.parse")),
    "archlinux_importer_v2" -> ("archlinux", Dedicated("ArchIngest.parse")),
    "apache_httpd_importer_v2" -> ("apache_httpd", Dedicated("ApacheHttpdIngest.parse")),
    "epss_importer_v2" -> ("epss", Dedicated("EpssIngest.fromCsv + donors")),
    // enrichment catalogs (improver-side in the reference)
    "enhance_with_kev_v2" -> ("kev", Dedicated("TabularIngest.kevFromJson")),
    "enhance_with_exploitdb_v2" -> ("exploitdb", Dedicated("TabularIngest.exploitDbFromCsv")),
    "enhance_with_metasploit_v2" -> ("metasploit", Dedicated("TabularIngest.metasploitFromJson")),
    "enhance_with_github_poc" -> ("github_poc", Dedicated("TabularIngest.githubPocFromTree")),
    "collect_ssvc_trees" -> ("vulnrichment", Dedicated("AdvisoryDerive.ssvcDecisions")),
    "add_cvssv3.1_to_CVEs" -> ("nvd",
      Dedicated("AdvisoryDerive.cveCvss31Severities")),
    // OVAL XML family
    "suse_oval_importer" -> ("suse_oval", Shared("OvalIngest.parse")),
    "debian_oval_importer" -> ("debian_oval", Shared("OvalIngest.parse")),
    "mozilla_importer_v2" -> ("mozilla", Dedicated("MozillaIngest.parse")),
    "apache_kafka_importer_v2" -> ("apache_kafka",
      Dedicated("ApacheKafkaIngest.parse")),
    "apache_tomcat_importer_v2" -> ("apache_tomcat",
      Dedicated("TomcatIngest.parse")),
    "openssl_importer_v2" -> ("openssl",
      Dedicated("OpensslIngest.parse")),
    "postgresql_importer_v2" -> ("postgresql",
      Dedicated("PostgresqlIngest.parse")),
    "xen_importer_v2" -> ("xen", Dedicated("XenIngest.parse")),
    "istio_importer_v2" -> ("istio", Dedicated("IstioIngest.parse")),
    "elixir_security_importer_v2" -> ("elixir_security",
      Dedicated("ElixirIngest.parse")),
    "ruby_importer_v2" -> ("ruby_advisory_db",
      Dedicated("RubyIngest.parse")),
    "nodejs_security_wg" -> ("npm", Dedicated("NodeSecurityIngest.parse")),
    "retiredotnet_importer_v2" -> ("retiredotnet",
      Dedicated("RetireDotnetIngest.parse")),
    "gentoo_importer_v2" -> ("gentoo", Dedicated("GentooIngest.parse")),
    "glibc_importer_v2" -> ("glibc", Dedicated("GlibcIngest.parse")),
    "mattermost_importer_v2" -> ("mattermost",
      Dedicated("MattermostIngest.parse")),
    "fireeye_importer_v2" -> ("fireeye",
      Dedicated("FireeyeIngest.parse")),
    "project-kb-msr-2019_v2" -> ("project_kb_msr2019",
      Dedicated("FixCommitDatasetsIngest.projectKbMsr2019")),
    "project-kb-statements_v2" -> ("project_kb_statements",
      Dedicated("ProjectKbStatementsIngest.parse")),
    "aosp_dataset_fix_commits" -> ("aosp",
      Dedicated("FixCommitDatasetsIngest.aosp")),
    "linux_kernel_cves_fix_commits" -> ("linux_kernel",
      Dedicated("FixCommitDatasetsIngest.linuxKernelCves")),
    // v1 npm security-wg importer (same dataset as nodejs_security_wg)
    "npm_importer" -> ("npm", Dedicated("NodeSecurityIngest.parse")),
    // Derive-side pipelines (no datasource — they recompute marts from
    // the advisory corpus; each maps to a deterministic Spark derivation)
    "remove_duplicate_advisories" ->
      ("-", Shared("AdvisoryDerive.dedupeByContent")),
    "compute_advisory_todo" -> ("-", Shared("AdvisoryDerive.todos")),
    "compute_advisory_todo_v2" ->
      ("-", Shared("AdvisoryDerive.todos + conflicts")),
    "compute_package_risk" -> ("-", Shared("AdvisoryDerive.packageRisk")),
    "compute_package_risk_v2" ->
      ("-", Shared("AdvisoryDerive.advisoryRiskFull + packageRisk")),
    "compute_version_rank" -> ("-", Shared("AdvisoryDerive.versionRank")),
    "compute_version_rank_v2" -> ("-", Shared("AdvisoryDerive.versionRank")),
    "flag_ghost_packages" -> ("-", Shared("AdvisoryDerive.ghostPackages")),
    "flag_ghost_packages_v2" -> ("-", Shared("AdvisoryDerive.ghostPackages")),
    "group_advisories_for_packages" ->
      ("-", Shared("AdvisoryDerive.advisorySets")),
    "populate_vulnerability_summaries" ->
      ("-", Shared("AdvisoryDerive.backfillSummaries")),
    "relate_severities_v2" -> ("-", Shared("AdvisoryDerive.relateSeverities")),
    "unfurl_version_range_v2" ->
      ("-", Shared("AdvisoryDerive.unfurl + staleImpacts")),
    "mark_unfurl_version_range_v2" ->
      ("-", Shared("AdvisoryDerive.allImpactsUnfurled")),
    "collect_fix_commits_v2" ->
      ("-", Shared("AdvisoryDerive.codeFixes + commitPatches")),
    "collect_ref_fix_commits_v2" ->
      ("-", Shared("AdvisoryDerive.commitPatches")),
    "federate_vulnerabilities_v2" ->
      ("-", Shared("FederatedExport.serialize")),
    "archive_improver_pipeline" ->
      ("-", Shared("ReferenceArchive.pendingArchive + applyArchiveResults"))) ++
    // the 37 per-repo fix-commit pipelines — one shared Spark operator
    FixCommitsIngest.Projects.map { case (pid, (ds, _)) =>
      pid -> (ds, Shared("FixCommitsIngest.fromCommits"): Support)
    }

  def implemented: Map[String, (String, Support)] =
    registry.filter { case (_, (_, s)) => !s.isInstanceOf[Missing] }

  def missing: Map[String, (String, Support)] =
    registry.filter { case (_, (_, s)) => s.isInstanceOf[Missing] }
}
