package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GoldenFiles
import graft.export.FederatedExport
import graft.ingest.AdvisoryJsonIngest
import graft.operators.SparkTestSession
import graft.serve.Serving

/** Golden-file pipeline test over the FIXTURES.md §1 advisory fixtures:
  * every derived table is canonical-JSON-compared to
  * src/test/resources/expected/<table>.json (regen with GRAFT_REGEN=1) — the
  * reference's check_results_against_json pattern (util_tests.py:24-60).
  */
class GoldenPipelineSpec extends AnyFunSuite with SparkTestSession {

  private val fixturesDir = "src/test/resources/fixtures/advisories"

  private lazy val derived: Map[String, DataFrame] = {
    val sp = spark
    import sp.implicits._
    val advisories = AdvisoryDerive.withContentIdAndLatest(
      (Seq("pypa", "ghsa", "debian").map(src =>
        AdvisoryJsonIngest.readTree(sp, s"$fixturesDir/$src", src).toDF()) :+
        graft.ingest.VulnrichmentIngest.parse(sp,
          sp.read.option("wholetext", "true")
            .text("src/test/resources/fixtures/vulnrichment")
            .select(col("value").as("json"),
              lit("vulnrichment").as("datasource_id"))).toDF())
        .reduce(_ unionByName _)).cache()
    val versionsDim = Seq(
      ("pkg:pypi/foo", "0.6.0"), ("pkg:pypi/foo", "0.6.18"),
      ("pkg:pypi/foo", "1.0.0"), ("pkg:pypi/foo", "1.20.0"),
      ("pkg:pypi/foo", "1.20.1"),
      ("pkg:pypi/bar", "1.0"), ("pkg:pypi/bar", "2.0"),
      ("pkg:npm/baz", "0.9.0"), ("pkg:npm/baz", "1.0.0"),
      ("pkg:npm/baz", "1.4.9"), ("pkg:npm/baz", "1.5.0"),
      ("pkg:npm/baz", "2.0.0"),
      ("pkg:deb/debian/curl", "7.50.3-1"), ("pkg:deb/debian/curl", "7.50.3-2"))
      .toDF("base_purl", "version")
    val impacts = AdvisoryDerive.impacts(advisories)
    val unfurled = AdvisoryDerive.unfurl(impacts, versionsDim).cache()
    val ranked = AdvisoryDerive.versionRank(versionsDim)
    val risk = AdvisoryDerive.advisoryRisk(advisories)
    val commitPatches = AdvisoryDerive.commitPatchesFromLinks(
      AdvisoryJsonIngest.commitLinks(sp, Seq("pypa", "ghsa", "debian")
        .map(src => AdvisoryJsonIngest.rawTree(sp, s"$fixturesDir/$src", src))
        .reduce(_ unionByName _)),
      Seq(("https://github.com/o/foo", "deadbeefdeadbeefdeadbeefdeadbeefdeadbeef",
        "--- a/resolver.c\n+++ b/resolver.c\n@@ -1 +1 @@\n-off by one\n+fixed\n"))
        .toDF("vcs_url", "commit_hash", "patch_text"))
    val mitigations = AdvisoryDerive.mitigations(unfurled, commitPatches)
    Map(
      "advisories" -> advisories.select("avid", "unique_content_id",
        "is_latest", "summary"),
      "impacted_packages" -> impacts,
      "impact_links" -> unfurled,
      "version_ranks" -> ranked,
      "risk_scores" -> risk,
      "nearest_fixes" -> AdvisoryDerive.nearestFix(unfurled, ranked),
      "package_risk" -> AdvisoryDerive.packageRisk(unfurled, risk),
      "advisory_sets" -> AdvisoryDerive.advisorySets(sp, advisories),
      "todos" -> AdvisoryDerive.todos(advisories),
      "conflicts" -> AdvisoryDerive.conflicts(advisories),
      "changelog" -> AdvisoryDerive.changeLog(advisories)
        .select("avid", "action_type", "source_url", "actor"),
      "api_affecting_foo_1_0_0" -> Serving.affectingAdvisories(
        advisories, unfurled, "pkg:pypi/foo", "1.0.0")
        .select("avid", "summary", "aliases"),
      "api_affecting_detail_foo_1_0_0" -> Serving.affectingAdvisoriesDetail(
        advisories, unfurled, risk, "pkg:pypi/foo", "1.0.0",
        mitigations = Some(mitigations)),
      "mitigations" -> mitigations,
      "mitigation_curation" ->
        AdvisoryDerive.mitigationCurationItems(unfurled),
      "packages" -> AdvisoryDerive.packages(versionsDim),
      "non_vulnerable_versions" ->
        Serving.nonVulnerableVersions(unfurled, ranked),
      "advisory_set_summaries" -> Serving.advisorySetSummaries(
        AdvisoryDerive.advisorySets(sp, advisories), risk),
      "export_yaml" -> FederatedExport.serialize(advisories),
      "export_package_index" -> FederatedExport.packageIndex(unfurled),
      // round-2 marts: EPSS-donated risk, SSVC decisions + serving,
      // structured commit patches, queryset variants
      "risk_scores_epss" -> AdvisoryDerive.advisoryRiskWithDonors(
        advisories,
        graft.ingest.EpssIngest.donors(graft.ingest.EpssIngest.fromCsv(sp,
          "src/test/resources/fixtures/epss/epss_scores_golden.csv")),
        Seq.empty[(String, Int)].toDF("domain", "weight")),
      "ssvc_decisions" -> AdvisoryDerive.ssvcDecisions(advisories),
      "ssvc_serving" -> Serving.advisorySsvc(advisories,
        AdvisoryDerive.ssvcDecisions(advisories),
        AdvisoryDerive.ssvcRelations(advisories,
          AdvisoryDerive.ssvcDecisions(advisories))),
      "commit_patches" -> commitPatches,
      "api_fixed_by_foo" -> Serving.advisoriesForPurls(advisories, unfurled,
        Seq(("pkg:pypi/foo", "1.20.0")).toDF("base_purl", "version"),
        mode = "fixed").select("avid", "summary", "aliases"),
      "api_purl_pairs" -> Serving.advisoryPurlPairs(unfurled,
        Seq(("pkg:pypi/foo", "1.0.0"), ("pkg:pypi/foo", "1.20.0"))
          .toDF("base_purl", "version"), mode = "both"),
      // round-12 continuation marts
      "code_fixes" -> AdvisoryDerive.codeFixes(advisories, unfurled),
      "package_changelog" ->
        AdvisoryDerive.packageChangeLog(unfurled, advisories),
    )
  }

  Seq("advisories", "impacted_packages", "impact_links", "version_ranks",
    "risk_scores", "nearest_fixes", "package_risk", "advisory_sets",
    "todos", "conflicts", "changelog", "api_affecting_foo_1_0_0",
    "api_affecting_detail_foo_1_0_0", "packages", "non_vulnerable_versions",
    "advisory_set_summaries", "export_yaml", "risk_scores_epss",
    "ssvc_decisions", "ssvc_serving", "commit_patches", "api_fixed_by_foo",
    "api_purl_pairs", "mitigations", "mitigation_curation",
    "code_fixes", "package_changelog")
    .foreach { name =>
    test(s"golden: $name") {
      GoldenFiles.check(name, derived(name))
    }
  }
}
