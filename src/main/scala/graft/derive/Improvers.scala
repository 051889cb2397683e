package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Vers}

/** The improver family — advisory data → inferences
  * (improvers/default.py DefaultImprover, improvers/valid_versions.py
  * ValidVersionImprover + NginxBasicImprover,
  * improvers/vulnerability_status.py), re-expressed as set-at-a-time
  * derivations, each cross-validated against the reference's captured
  * improver fixtures (CapturedImproverSpec, 20 sets).
  *
  * The reference improves one advisory at a time in Python; here one
  * DataFrame pass derives every advisory's inferences at once:
  *
  *  - [[defaultInferences]] needs only the impact rows themselves
  *    (constraint-endpoint expansion — per-row array work, map-only);
  *  - [[validVersionInferences]] joins the advisory impacts against the
  *    corpus-scale versions dimension, with range containment through
  *    the codegen'd version_in_range path and the nearest-fix assignment
  *    as one window per (impact, package) group — the reference's
  *    per-advisory `bisect_right` loop becomes a single sorted-window
  *    `last(unaffected)` lookback, so no driver-side iteration and no
  *    per-advisory version fetch.
  *
  * Inference rows are uniform across both: (avid, ptype, namespace,
  * name, qualifiers, affected_versions, fixed_version, confidence);
  * advisory-level facets (aliases/summary/references/weaknesses) stay on
  * the advisory table and join by avid at serving time — exactly the
  * reference's Inference.from_advisory_data copy-through.
  */
object Improvers {

  val MaxConfidence = 100

  /** Registry parity vs the reference's ACTIVE improver registry
    * (improvers/__init__.py:30-48 IMPROVERS_REGISTRY). Improver files
    * that sit in the reference tree but are NOT registered there:
    *  - `add_missing_refid.py` CveIdImprover — v1-era, unregistered;
    *    implemented here anyway as [[cveIdBackfill]] (one map-only
    *    regexp_extract, d21-oracled) because the data repair is still
    *    useful at serving time.
    * Everything in the active registry maps to an engine operator
    * (exploitdb/kev/metasploit enrichments, ghost flagging, risk,
    * unfurl, ssvc, relate-severities, archive, todo/conflicts, fix
    * commits, github PoC, patch-set grouping) — see SURVEY §2. */
  val unregisteredReferenceImprovers: Map[String, String] = Map(
    "add_missing_refid" ->
      "not in IMPROVERS_REGISTRY; implemented as Improvers.cveIdBackfill")

  /** CveIdImprover (improvers/add_missing_refid.py:26-46): references
    * with a missing id whose url is an NVD CVE detail page get the
    * CVE id regex-extracted from the url (uppercase CVE only, the
    * reference's own note). No-match urls keep their missing id (the
    * `if cve_match` guard). Map-only — no shuffle at any scale. */
  def cveIdBackfill(references: DataFrame): DataFrame = {
    val extracted =
      regexp_extract(col("url"), "(CVE-\\d{4}-\\d{4,7})", 1)
    references.withColumn("reference_id",
      when((col("reference_id").isNull || col("reference_id") === "") &&
        col("url").contains("nvd.nist.gov/vuln/detail/CVE-") &&
        extracted =!= "",
        extracted).otherwise(col("reference_id")))
  }

  // Endpoint extraction + rendering run as the NATIVE catalyst
  // expressions (expr/VersionExpressions.scala — vers_endpoints_native /
  // vers_excluded_native / version_render_native): the whole inference
  // assembly stays inside WholeStageCodegen, pinned UDF-free by
  // PlanAuditSpec. The natives are null-propagating where the old UDF
  // twins returned empties, so call sites coalesce explicitly.
  private val emptyStrArr = array().cast("array<string>")
  private def resolvedEndpoints(spec: org.apache.spark.sql.Column) =
    coalesce(call_function("vers_endpoints_native", spec), emptyStrArr)
  private def excludedEndpoints(spec: org.apache.spark.sql.Column) =
    coalesce(call_function("vers_excluded_native", spec), emptyStrArr)

  // get_exact_purls emits `str(version)` on univers objects — the
  // scheme-aware canonical rendering (VersionOrd.render; apache
  // four-segment → +build is the one non-identity family). A null
  // scheme renders identity, so call sites pass coalesce(scheme, '').
  private def renderAll(scheme: org.apache.spark.sql.Column,
      vs: org.apache.spark.sql.Column) =
    transform(vs, v =>
      call_function("version_render_native", coalesce(scheme, lit("")), v))
  private def render(scheme: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column) =
    call_function("version_render_native", coalesce(scheme, lit("")), v)

  /** DefaultImprover.get_inferences (improvers/default.py:52-85) +
    * get_exact_purls (:88-141): disregard ranges except for their exact
    * endpoints.
    *
    *  - affected = constraint endpoints that satisfy their own range;
    *  - fixed = `!=` excluded endpoints plus the explicit fixed_version;
    *  - one inference per fixed version (affected list repeated), or a
    *    single fixed-less inference when none;
    *  - an advisory with no impact rows yields one empty inference.
    *
    * Qualifiers ride through untouched on both sides
    * (utils.update_purl_version keeps every purl field).
    *
    * @param advisories (avid) — one row per advisory
    * @param impacts (avid, ptype, namespace, name, qualifiers,
    *                affecting_vers, fixed_version)
    */
  def defaultInferences(advisories: DataFrame, impacts: DataFrame): DataFrame = {
    val scheme = coalesce(
      nullif(regexp_extract(col("affecting_vers"), "^vers:([^/]+)/", 1),
        lit("")),
      col("ptype"))
    // FanOut before the native vers parse/render: per-impact endpoint
    // resolution is the heavy per-row work and a single-row-group scan
    // otherwise runs it on one core (no-op at scale — the guard).
    // Row multiplicities are preserved (round-robin repartition), which
    // this operator's contract requires — duplicate impacts emit
    // duplicate inferences.
    val perImpact = graft.core.FanOut(impacts)
      .withColumn("affected_versions",
        renderAll(scheme, resolvedEndpoints(col("affecting_vers"))))
      .withColumn("fixed_versions", renderAll(scheme, concat(
        excludedEndpoints(col("affecting_vers")),
        when(col("fixed_version").isNotNull &&
          length(col("fixed_version")) > 0, array(col("fixed_version")))
          .otherwise(array().cast("array<string>")))))
    val exploded = perImpact.select(col("avid"), col("ptype"),
      col("namespace"), col("name"), col("qualifiers"),
      col("affected_versions"),
      explode_outer(when(size(col("fixed_versions")) > 0,
        col("fixed_versions"))).as("fixed_version"))
    val packageless = advisories
      .join(impacts.select("avid").distinct(), Seq("avid"), "left_anti")
      .select(col("avid"), lit(null).cast("string").as("ptype"),
        lit(null).cast("string").as("namespace"),
        lit(null).cast("string").as("name"),
        lit(null).cast("string").as("qualifiers"),
        array().cast("array<string>").as("affected_versions"),
        lit(null).cast("string").as("fixed_version"))
    exploded.unionByName(packageless)
      .withColumn("confidence", lit(MaxConfidence))
  }

  /** NginxBasicImprover (improvers/valid_versions.py:216-283 +
    * utils.py:482-509 is_vulnerable_nginx_version): the nginx
    * branch-aware expansion. Per mergeable advisory (several distinct
    * purls → nothing, the reference's UnMergeablePackageError path):
    *
    *  - a known version is AFFECTED when it is inside some advisory
    *    range AND no fixed version shares its MINOR number while being
    *    ≤ it (the reference compares minor only — not (major, minor) —
    *    and that literal quirk is mirrored);
    *  - one inference per fixed version (nginx-order sorted, deduped),
    *    each carrying the same affected list, confidence 90 — including
    *    fixes BELOW the affected versions (the reference's documented
    *    TODO behavior);
    *  - a version inside TWO ranges appears twice in the affected list
    *    (the reference appends per range).
    *
    * Scale shape: ranges × known-versions is the only join that touches
    * the corpus-scale versions table; containment and the sort key are
    * codegen'd; the fixed-version check is an exists() over a per-
    * advisory array (advisory-bounded).
    *
    * @param impacts (avid, ptype, namespace, name, qualifiers,
    *                affecting_vers, fixed_version)
    * @param validVersions (ptype, namespace, name, version)
    */
  def nginxInferences(impacts: DataFrame,
      validVersions: DataFrame): DataFrame = {
    val purlKey = concat_ws("\u0001",
      coalesce(col("ptype"), lit("")), coalesce(col("namespace"), lit("")),
      coalesce(col("name"), lit("")), coalesce(col("qualifiers"), lit("")))
    val mergeableAvids = impacts.groupBy("avid")
      .agg(countDistinct(purlKey).as("_np"))
      .filter(col("_np") === 1).select("avid")
    val imp = impacts.join(mergeableAvids, Seq("avid"), "left_semi")

    val minorOf = (v: org.apache.spark.sql.Column) =>
      split(v, "\\.").getItem(1).cast("int")
    val fixed = imp
      .filter(col("fixed_version").isNotNull &&
        length(col("fixed_version")) > 0)
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        col("qualifiers"), col("fixed_version")).distinct()
      .withColumn("_fkey", GraftFunctions.versionSortKey(lit("nginx"),
        col("fixed_version")))
      .withColumn("_fminor", minorOf(col("fixed_version")))
    val fixedArr = fixed.groupBy("avid")
      .agg(collect_list(struct(col("_fminor").as("minor"),
        col("_fkey").as("fkey"))).as("_fixes"))

    val ranges = imp
      .filter(col("affecting_vers").isNotNull &&
        length(col("affecting_vers")) > 0)
      .select("avid", "ptype", "namespace", "name", "affecting_vers")
      .distinct()
    val hits = ranges
      .join(validVersions.select("ptype", "namespace", "name", "version")
        .distinct(), Seq("ptype", "namespace", "name"))
      .filter(GraftFunctions.versionInRange(col("version"),
        col("affecting_vers")))
      .withColumn("_vkey", GraftFunctions.versionSortKey(lit("nginx"),
        col("version")))
      .withColumn("_vminor", minorOf(col("version")))
      .join(fixedArr, Seq("avid"), "left")
      .filter(!exists(coalesce(col("_fixes"), array()
          .cast("array<struct<minor:int,fkey:string>>")),
        f => f.getField("minor") === col("_vminor") &&
          col("_vkey") >= f.getField("fkey")))
      .groupBy("avid")
      .agg(sort_array(collect_list(struct(col("_vkey"), col("version"))))
        .as("_av"))
      .withColumn("affected_versions",
        expr("transform(_av, x -> x.version)"))
      .select("avid", "affected_versions")

    fixed.join(hits, Seq("avid"), "left")
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        col("qualifiers"),
        coalesce(col("affected_versions"),
          array().cast("array<string>")).as("affected_versions"),
        col("fixed_version"))
      .withColumn("confidence", lit(90))
  }

  /** VulnerabilityStatusImprover (improvers/vulnerability_status.py:
    * 44-103): one MITRE CVE API record per CVE id → the vulnerability
    * status enum (models.py:229-234): DISPUTED (2) when the CNA tags
    * contain "disputed", INVALID (3) when cveMetadata.state is
    * REJECTED, PUBLISHED (1) otherwise — including when the record is
    * missing/unfetchable (the reference's None → PUBLISHED fallback).
    * The update side is the alias equi-join the serving layer already
    * has (j9); this derives the per-CVE status column from the raw
    * captured JSON with codegen'd json-path extraction, map-only.
    *
    * @param cveRecords (cve_id, body) — body is the raw MITRE CVE
    *                   record JSON (null/unparseable → PUBLISHED)
    */
  def vulnerabilityStatuses(cveRecords: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    // ONE from_json instead of two get_json_object + a from_json: each
    // get_json_object re-parses the record, so the old shape paid three
    // JSON parses per row; a struct-schema parse pays one and the
    // accessors are free field reads. FanOut first: the parse is the
    // per-row heavy part and a single-row-group scan otherwise runs the
    // whole corpus on one core (no-op at scale — the guard).
    val schema = StructType(Seq(
      StructField("cveMetadata",
        StructType(Seq(StructField("state", StringType)))),
      StructField("containers", StructType(Seq(StructField("cna",
        StructType(Seq(StructField("tags",
          ArrayType(StringType))))))))))
    val p = from_json(col("body"), schema)
    graft.core.FanOut(cveRecords.select(col("cve_id"), col("body")))
      .select(col("cve_id"),
        when(coalesce(array_contains(
          p.getField("containers").getField("cna").getField("tags"),
          "disputed"), lit(false)), 2)
          .when(p.getField("cveMetadata").getField("state") === "REJECTED", 3)
          .otherwise(1).as("status"))
  }

  /** ValidVersionImprover.get_inferences + generate_inferences
    * (improvers/valid_versions.py:85-214, utils.resolve_version_range /
    * nearest_patched_package / get_affected_packages_by_patched_package):
    * expand each impact's range against the KNOWN versions of its
    * package, assign every affected version its nearest strictly-greater
    * unaffected version as the fix, and group affected versions per fix.
    *
    * Faithful branch structure:
    *  - a range-less impact with a fixed_version yields ([], fixed) —
    *    with qualifiers when the advisory's impacts merge to one purl
    *    (AffectedPackage.merge path keeps pkg_qualifiers), without when
    *    they don't (the unmergeable branch builds the purl from
    *    type/namespace/name only);
    *  - range expansion always drops qualifiers
    *    (expand_verion_range_to_purls);
    *  - a range that matches no known version yields NOTHING;
    *  - affected versions above every unaffected one group under a NULL
    *    fix.
    *
    * Version hygiene per resolve_version_range: strip spaces and a
    * leading v/V before matching.
    *
    * Scale shape: `validVersions` is the corpus-scale versions dimension;
    * impacts (advisory-sized) join it on the package natural key, range
    * containment runs as the codegen'd expression over the joined
    * stream, and the fix assignment is one window per (impact, package)
    * partition — no collect, no per-advisory remote fetch.
    *
    * @param impacts (avid, ptype, namespace, name, qualifiers,
    *                affecting_vers, fixed_version)
    * @param validVersions (ptype, namespace, name, version)
    */
  def validVersionInferences(impacts: DataFrame,
      validVersions: DataFrame): DataFrame = {
    // AffectedPackage.merge (importer.py): one distinct purl across the
    // advisory's impacts → merged branch; several → unmergeable branch.
    // (null-safe key: countDistinct drops tuples containing a null)
    val mergeable = impacts.groupBy("avid")
      .agg(countDistinct(concat_ws("\u0001",
        coalesce(col("ptype"), lit("")), coalesce(col("namespace"), lit("")),
        coalesce(col("name"), lit("")), coalesce(col("qualifiers"), lit(""))))
        .as("_npurl"),
        max(when(col("affecting_vers").isNotNull &&
          length(col("affecting_vers")) > 0, 1).otherwise(0))
          .as("_has_range"))
      .withColumn("_merged", col("_npurl") === 1).drop("_npurl")
    val marked = impacts.join(mergeable, Seq("avid"))
      .withColumn("_impact_id", monotonically_increasing_id())

    // Branch A: range-less fixed pins. Merged keeps qualifiers,
    // unmergeable drops them (valid_versions.py:108-120 vs :136-156).
    // In the MERGED branch pins only surface when the advisory has NO
    // range at all (valid_versions.py:148-156: `if not
    // affected_version_ranges` — otherwise only range inferences emit);
    // the unmergeable branch decides row by row.
    val rangeless = marked
      .filter((col("affecting_vers").isNull ||
        length(col("affecting_vers")) === 0) &&
        col("fixed_version").isNotNull && length(col("fixed_version")) > 0)
      .filter(!col("_merged") || col("_has_range") === 0)
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        when(col("_merged"), col("qualifiers")).as("qualifiers"),
        array().cast("array<string>").as("affected_versions"),
        render(col("ptype"), col("fixed_version")).as("fixed_version"))

    // Branch B: range expansion against the known versions.
    // NOT pre-partitioned by the package key: hashing the impacts side
    // on (pkg) before the join would move the fan-out shuffle earlier,
    // but it caps parallelism at the distinct-package count — measured
    // 110 s vs 96 s at 100x on the low-cardinality bench corpus. The
    // window's (pkg, _impact_id) clustering below adapts by itself:
    // satisfied in place after a sort-merge join (high-cardinality
    // corpora), hashed on the uniform _impact_id when the small-dim
    // broadcast plan exchanges the fan-out.
    val ranged = marked
      .filter(col("affecting_vers").isNotNull &&
        length(col("affecting_vers")) > 0)
      .select("_impact_id", "avid", "ptype", "namespace", "name",
        "affecting_vers")
    // the distinct stays UN-pre-partitioned: its partial aggregate
    // dedups map-side at full scan parallelism, so both its exchange
    // and the join's re-shuffle carry only the deduped dimension rows
    // — pre-hashing by the package key would funnel the raw dimension
    // through however many distinct packages exist before any dedup
    val cleaned = validVersions
      .withColumn("version", regexp_replace(col("version"), "\\s+", ""))
      .withColumn("version", regexp_replace(col("version"), "^[vV]+", ""))
      .select("ptype", "namespace", "name", "version").distinct()
    // Pure-interval bound extraction (vers_pure_bounds_native — the
    // data-column analog of ConstantVersionRangeRewrite): on the
    // impacts side, BEFORE the fan-out join, so the per-row parse runs
    // once per impact, not once per (impact, version) pair.
    val withBounds = ranged.withColumn("_b",
      call_function("vers_pure_bounds_native", col("affecting_vers")))
    // split BEFORE the fan-out join, on the small impacts side: each
    // branch's join output is consumed exactly once, so the fan-out is
    // never recomputed (a first cut split AFTER the join re-ran the
    // join per consumer and measured 98 s vs 80 s at 100×)
    def fanout(imps: DataFrame): DataFrame = imps
      .join(cleaned, Seq("ptype", "namespace", "name"))
      .withColumn("_vkey", GraftFunctions.versionSortKey(
        regexp_extract(col("affecting_vers"), "^vers:([^/]+)/", 1),
        col("version")))

    // PURE-INTERVAL fast path (every bench range and most real ones):
    // membership is two codegen'd key comparisons — exactly
    // Vers.contains on such specs, which compares the same keys. The
    // data-dependent bound pre-prune drops versions keyed below the
    // lower endpoint BEFORE anything aggregates (they are neither
    // affected nor fix candidates — the nearest fix walks only ABOVE
    // an affected row), and because every in-interval version shares
    // the one nearest above-interval fix, a SINGLE map-side-combining
    // aggregation replaces the full-fan-out descending window: the
    // affected list and the min fix candidate come out of the same
    // groupBy, whose (pkg, _impact_id) keys reuse the join's (pkg)
    // clustering on the sort-merge path — no exchange, no sort. Ties
    // between versions with equal keys resolve to the smallest version
    // string — matching the general window path's (_vkey, version)
    // desc tiebreak, so both routes agree on key-tied corpora.
    val pj = fanout(withBounds.filter(col("_b.pure")))
      .filter(col("_b.lo_key").isNull ||
        col("_vkey") >= col("_b.lo_key"))
      .withColumn("in_range",
        (col("_b.lo_key").isNull || col("_vkey") >= col("_b.lo_key")) &&
          (col("_b.hi_key").isNull ||
            when(col("_b.hi_incl"), col("_vkey") <= col("_b.hi_key"))
              .otherwise(col("_vkey") < col("_b.hi_key"))))
    val pureExpanded = pj
      .groupBy("ptype", "namespace", "name", "_impact_id", "avid")
      .agg(
        sort_array(collect_list(when(col("in_range"),
          struct(col("_vkey"), col("version"))))).as("_av"),
        min(when(!col("in_range"), struct(col("_vkey"), col("version"))))
          .as("_f"))
      .filter(size(col("_av")) > 0)
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        lit(null).cast("string").as("qualifiers"),
        expr("transform(_av, x -> x.version)").as("affected_versions"),
        col("_f").getField("version").as("fixed_version"))

    // GENERAL path (exclusions, pins-with-ranges, multi-interval,
    // inverted bounds): the full interval walk + nearest-fix window,
    // semantics unchanged from the single-path formulation.
    val joined = fanout(withBounds.filter(!col("_b.pure")))
      .withColumn("in_range", GraftFunctions.versionInRange(col("version"),
        col("affecting_vers")))
    // nearest strictly-greater unaffected version (bisect_right): walk
    // versions descending; the fix for an affected row is the LAST
    // unaffected version seen strictly before it.
    // _impact_id alone determines the partition (it is unique per
    // impact row), but leading with the package columns lets the window
    // reuse the equi-join's (pkg) clustering on the sort-merge path —
    // the post-join fan-out (the largest intermediate in this improver)
    // is sorted in place instead of reshuffled
    // (_vkey, in_range, version) desc, not _vkey alone: schemes can
    // sort-tie DISTINCT version strings (apache build metadata —
    // 0.10.2.2 ties 0.10.2), and with a bare _vkey order the
    // last-unaffected pick on a tied pair was sort-order-dependent.
    //  - in_range desc puts a tie group's AFFECTED rows before its
    //    unaffected rows in the descending walk, so a tied unaffected
    //    version is never offered as the fix — bisect_right semantics
    //    (utils.py:190: the fix is the nearest STRICTLY-greater
    //    unaffected version; equal precedence is skipped);
    //  - version desc makes the pick among key-tied unaffected rows
    //    deterministic (smallest string), agreeing with the pure path's
    //    min(struct(_vkey, version)). Pinned by
    //    ImproverPathEquivalenceSpec's apache tie corpus.
    val w = Window
      .partitionBy("ptype", "namespace", "name", "_impact_id")
      .orderBy(col("_vkey").desc, col("in_range").desc, col("version").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = joined
      .withColumn("fixed_version",
        last(when(!col("in_range"), col("version")), ignoreNulls = true)
          .over(w))
      .filter(col("in_range"))
    val expanded = assigned
      .groupBy("_impact_id", "avid", "ptype", "namespace", "name",
        "fixed_version")
      .agg(sort_array(collect_list(struct(col("_vkey"), col("version"))))
        .as("_av"))
      .withColumn("affected_versions",
        expr("transform(_av, x -> x.version)"))
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        lit(null).cast("string").as("qualifiers"),
        col("affected_versions"), col("fixed_version"))

    rangeless.unionByName(expanded).unionByName(pureExpanded)
      .withColumn("confidence", lit(MaxConfidence))
  }
}
