package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The v2 package API family (api_v2.py:192-330 — PackageV2Serializer,
  * PackageV2ViewSet.get_queryset filters, and the list endpoint's
  * page-scoped `vulnerabilities` dict). The reference keeps its suite
  * for this family commented out (tests/test_api_v2.py:216-475), but
  * the expectations still document the serializer contract — the
  * captured shapes are golden-pinned by CapturedApiSpec part 5.
  */
object PackageV2 {

  private val emptyAffected =
    "CAST(array() AS ARRAY<STRUCT<vulnerability_id: STRING, " +
      "fixed_by_packages: STRING, code_fixes: ARRAY<STRING>>>)"

  /** One row per concrete package — the PackageV2Serializer fields
    * (api_v2.py:192-243):
    *
    *  - `affected_by_vulnerabilities`: the serializer's dict keyed by
    *    vulnerability_id, modeled as a vulnerability_id-sorted array
    *    of structs (vulnerability_id, fixed_by_packages, code_fixes).
    *    `fixed_by_packages` is the vulnerability's first fixed-by purl
    *    — Django's `.first()` on an unordered queryset, modeled as the
    *    MIN purl so the pick is deterministic; null when the
    *    vulnerability has no fixing package (the captured fixture's
    *    `fixed_by_packages: None`, test_api_v2.py:354-362).
    *    `code_fixes` lists the vulnerability's codefix URLs; empty
    *    when no codefix mart is supplied (the fixture's
    *    `code_fixes: []`).
    *  - `fixing_vulnerabilities`: sorted VCIDs the package fixes; a
    *    GHOST package fixes nothing (api_v2.py:239-242).
    *  - `next_non_vulnerable_version` / `latest_non_vulnerable_version`
    *    from the W3 safe-version mart; null when no safe version ranks
    *    above (the fixture's None, test_api_v2.py:350-351).
    *  - `risk_score`: package risk (A8 — max affecting-advisory risk);
    *    null when no risk mart is supplied (the fixture's None).
    *
    * The v2 queryset filters (purl in-list, affected_by_vulnerability,
    * fixing_vulnerability — api_v2.py:286-300) are plain predicates on
    * the returned columns (`purl isin …`,
    * `exists(affected_by_vulnerabilities, x -> x.vulnerability_id = v)`,
    * `array_contains(fixing_vulnerabilities, v)`).
    *
    * Scale shape: every aggregation groups on (base_purl, version) or
    * vulnerability_id — partial-aggregatable equi-shuffles over narrow
    * rows; the one window is the rank mart the W1 family already pays;
    * no collect, no per-package iteration (the reference serializes
    * per row in Python — test_list_packages records 31 queries for two
    * packages).
    *
    * @param packages concrete packages (base_purl, version[, is_ghost])
    * @param unfurled the unfurl mart (avid, base_purl, version,
    *                 is_affected, is_fixed)
    * @param member avid → vulnerability_id (VulnerabilityV1.membership)
    * @param codeFixUrls optional (avid, code_fix_url) rows
    * @param advisoryRisk optional (avid, …, risk_score) rows
    */
  def packageList(packages: DataFrame, unfurled: DataFrame,
      member: DataFrame, codeFixUrls: Option[DataFrame] = None,
      advisoryRisk: Option[DataFrame] = None): DataFrame = {
    val vcids = member.select("avid", "vulnerability_id")
    val linked = unfurled.join(vcids, Seq("avid"))
    // per vulnerability: its first fixed-by purl (min; see scaladoc)
    val fixedOfVuln = linked
      .filter(col("is_fixed") && col("version").isNotNull)
      .groupBy("vulnerability_id")
      .agg(min(concat(col("base_purl"), lit("@"), col("version")))
        .as("fixed_by_packages"))
    val fixesOfVuln = codeFixUrls.map(cf => cf.join(vcids, Seq("avid"))
      .groupBy("vulnerability_id")
      .agg(sort_array(collect_set(col("code_fix_url"))).as("_cf")))
    val affectedBase = linked.filter(col("is_affected"))
      .select("base_purl", "version", "vulnerability_id").distinct()
      .join(fixedOfVuln, Seq("vulnerability_id"), "left")
    val affectedVulns = fixesOfVuln
      .fold(affectedBase.withColumn("_cf", expr("array()")
        .cast("array<string>")))(f =>
        affectedBase.join(f, Seq("vulnerability_id"), "left"))
      .groupBy("base_purl", "version")
      .agg(sort_array(collect_list(struct(col("vulnerability_id"),
        col("fixed_by_packages"),
        coalesce(col("_cf"), expr("array()").cast("array<string>"))
          .as("code_fixes"))))
        .as("affected_by_vulnerabilities"))
    val fixing = linked.filter(col("is_fixed"))
      .groupBy("base_purl", "version")
      .agg(sort_array(collect_set(col("vulnerability_id"))).as("_fixing"))
    val nonVuln = Serving
      .nonVulnerableVersions(unfurled, Serving.versionRanks(packages))
      .select("base_purl", "version", "next_non_vulnerable",
        "latest_non_vulnerable")
    val ghost = if (packages.columns.contains("is_ghost"))
      coalesce(col("is_ghost"), lit(false)) else lit(false)
    val base = packages
      .select(col("base_purl"), col("version"), ghost.as("_ghost"))
      .distinct()
      .join(affectedVulns, Seq("base_purl", "version"), "left")
      .join(fixing, Seq("base_purl", "version"), "left")
      .join(nonVuln, Seq("base_purl", "version"), "left")
    val withRisk = advisoryRisk
      .map(ar => graft.derive.AdvisoryDerive.packageRisk(unfurled, ar))
      .fold(base.withColumn("risk_score", lit(null).cast("double")))(r =>
        base.join(r, Seq("base_purl", "version"), "left"))
    withRisk.select(
      concat(col("base_purl"), lit("@"), col("version")).as("purl"),
      coalesce(col("affected_by_vulnerabilities"), expr(emptyAffected))
        .as("affected_by_vulnerabilities"),
      when(col("_ghost"), expr("array()").cast("array<string>"))
        .otherwise(coalesce(col("_fixing"),
          expr("array()").cast("array<string>")))
        .as("fixing_vulnerabilities"),
      col("next_non_vulnerable").as("next_non_vulnerable_version"),
      col("latest_non_vulnerable").as("latest_non_vulnerable_version"),
      col("risk_score"))
  }

  /** CodeFixV2 list endpoint (api_v2.py:679-696 CodeFixV2ViewSet +
    * :605-654 CodeFixV2Serializer; captured expectations
    * tests/test_api_v2.py:860-913): the code-fix mart rows
    * (AdvisoryDerive.codeFixesFromLinks — one row per first-claiming
    * advisory commit × affected package) in the serializer's field
    * names — `affected_advisory_id` is the avid, `commits` the VCS
    * URL list, `affected_package_purl` the concrete purl — optionally
    * filtered by the advisory's avid (exact, the viewset's
    * `advisory_id` query param; unknown ids yield an empty list, not
    * an error). A request-bounded filter over a derived mart: the
    * predicate pushes to the mart scan. */
  def v2CodeFixes(codeFixes: DataFrame,
      advisoryId: Option[String] = None): DataFrame = {
    val base = codeFixes.select(
      col("avid").as("affected_advisory_id"),
      array(col("vcs_url")).as("commits"),
      col("affected_package").as("affected_package_purl"))
    advisoryId.fold(base)(a =>
      base.filter(col("affected_advisory_id") === a))
  }

  /** The pre-ghost-mask fixing relation (purl, vulnerability_id) — the
    * ORM `package.fixing_vulnerabilities` M2M that the v2 list
    * endpoint's dict collection walks directly (api_v2.py:312-314),
    * BEFORE the serializer's ghost exclusion (api_v2.py:239-242)
    * empties the per-package list. Feed it to [[vulnerabilitiesDict]]
    * so a vulnerability fixed only by a ghost package still appears in
    * the page dict, exactly as the reference responds. */
  def fixingRelation(unfurled: DataFrame, member: DataFrame): DataFrame =
    unfurled.filter(col("is_fixed") && col("version").isNotNull)
      .join(member.select("avid", "vulnerability_id"), Seq("avid"))
      .select(concat(col("base_purl"), lit("@"), col("version")).as("purl"),
        col("vulnerability_id"))
      .distinct()

  /** The list endpoint's page-scoped `vulnerabilities` dict
    * (api_v2.py:301-330): every vulnerability referenced by the page's
    * packages — affected-by and fixing sides both — keyed by VCID.
    * `vulnerabilities` is the V1/V2 vulnerability mart
    * (VulnerabilityV1.vulnerabilities: vulnerability_id, aliases,
    * summary, risk trio — the VulnerabilityV2Serializer core). The
    * page is request-bounded, so the semi-joins broadcast.
    *
    * Pass `fixingAll` ([[fixingRelation]]) to reproduce the reference
    * exactly: its list() collects the fixing side from the ORM relation
    * (api_v2.py:312-314), which does NOT apply the serializer's ghost
    * rule — a vulnerability fixed only by a ghost package appears in
    * the page dict even though every package row shows it fixing
    * nothing. Without `fixingAll` the fixing side falls back to the
    * page rows' (ghost-masked) `fixing_vulnerabilities` arrays — a
    * documented divergence for callers that only have the serialized
    * page. */
  def vulnerabilitiesDict(packagesPage: DataFrame,
      vulnerabilities: DataFrame,
      fixingAll: Option[DataFrame] = None): DataFrame = {
    val affectedSide = packagesPage
      .select(explode(expr(
        "transform(affected_by_vulnerabilities, x -> x.vulnerability_id)"))
        .as("vulnerability_id"))
    val fixingSide = fixingAll match {
      case Some(rel) => rel
        .join(broadcast(packagesPage.select("purl")), Seq("purl"),
          "left_semi")
        .select("vulnerability_id")
      case None => packagesPage
        .select(explode(col("fixing_vulnerabilities"))
          .as("vulnerability_id"))
    }
    val referenced = affectedSide.union(fixingSide).distinct()
    vulnerabilities.join(broadcast(referenced),
      Seq("vulnerability_id"), "left_semi")
  }
}
