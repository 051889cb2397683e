package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.serve.Serving

/** SURVEY §2 S9 — the latest-affecting/fixed-by queryset variants
  * (models.py:2946-3067) exercised through the REAL serving functions
  * over a synthetic unfurled-links table derived from lineitem, with the
  * oracle re-deriving the same semi-join semantics in SQL. The request
  * list is bounded and broadcast inside Serving (the scale contract the
  * plan spec in AdvisoryPipelineSpec pins).
  */
object ServingQueries extends QueryModule {

  private def unfurled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  private val unfurledSql =
    """SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       CAST(l_linenumber AS VARCHAR) AS version,
      |       l_quantity > 25 AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem""".stripMargin

  private val Request = Seq(
    ("pkg:npm/p1", "1"), ("pkg:npm/p2", "3"), ("pkg:npm/p5", "2"))

  private val requestSql =
    "(VALUES ('pkg:npm/p1','1'),('pkg:npm/p2','3'),('pkg:npm/p5','2'))" +
      " AS req(base_purl, version)"

  private def request(s: SparkSession): DataFrame = {
    import s.implicits._
    Request.toDF("base_purl", "version")
  }

  /** Order-sensitive variant for s21: versions are `1.<2×linenumber>`
    * (1.2 … 1.14) and linenumbers 3/5/6 (versions 1.6, 1.10, 1.12) are
    * never affected, so latest_non_vulnerable under lexicographic order
    * ("1.6") and ecosystem version order ("1.12") DISAGREE — the
    * fixture that would have caught the round-11 lexicographic-max
    * bug. */
  private def unfurledV(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      concat(lit("1."), (col("l_linenumber") * 2).cast("string"))
        .as("version"),
      (col("l_quantity") > 25 && !col("l_linenumber").isin(3, 5, 6))
        .as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  private val unfurledVSql =
    """SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       '1.' || CAST(l_linenumber * 2 AS VARCHAR) AS version,
      |       l_quantity > 25 AND l_linenumber NOT IN (3, 5, 6)
      |         AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem""".stripMargin

  private val RequestV = Seq(
    ("pkg:npm/p1", "1.2"), ("pkg:npm/p2", "1.6"), ("pkg:npm/p5", "1.4"))

  private val requestVSql =
    "(VALUES ('pkg:npm/p1','1.2'),('pkg:npm/p2','1.6')," +
      "('pkg:npm/p5','1.4')) AS req(base_purl, version)"

  private def requestV(s: SparkSession): DataFrame = {
    import s.implicits._
    RequestV.toDF("base_purl", "version")
  }

  override val entries: Seq[QueryEntry] = Seq(
    // latest_affecting_advisories_for_purls (models.py:2955-2964)
    q("s9_affecting_bulk",
      s"""WITH u AS ($unfurledSql)
         |SELECT DISTINCT u.avid
         |FROM u JOIN $requestSql
         |  ON u.base_purl = req.base_purl AND u.version = req.version
         |WHERE u.is_affected
         |ORDER BY avid""") { (s, dir) =>
      val u = unfurled(s, dir)
      val advisories = u.select("avid").distinct()
        .withColumn("is_latest", lit(true))
      Serving.advisoriesForPurls(advisories, u, request(s), "affecting")
        .select("avid").orderBy("avid")
    },

    // AdvisoryMitigations mart (models.py:3473-3531) through the REAL
    // derive path: synthetic commit links run commitPatchesFromLinks,
    // the unfurled table feeds the per-(avid, purl) upgrade sets, and
    // AdvisoryDerive.mitigations assembles the remediation rows the v3
    // detail nests. Arrays are joined to strings for the hash compare.
    q("s10_mitigations",
      s"""WITH u AS ($unfurledSql),
         |fixedv AS (SELECT DISTINCT avid, base_purl, version FROM u
         |           WHERE is_fixed),
         |up AS (SELECT avid, base_purl,
         |              string_agg(version, ',' ORDER BY version) AS upgrades
         |       FROM fixedv GROUP BY 1, 2),
         |imp AS (SELECT DISTINCT avid, base_purl FROM u WHERE is_affected),
         |pl AS (
         |  SELECT DISTINCT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
         |         'https://git.example/r' || CAST(l_partkey % 5 AS VARCHAR) ||
         |           '@' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
         |           AS patch_id
         |  FROM lineitem WHERE l_orderkey % 7 = 0),
         |pa AS (SELECT avid,
         |              string_agg(patch_id, ',' ORDER BY patch_id)
         |                AS patch_ids
         |       FROM pl GROUP BY 1)
         |SELECT imp.avid, imp.base_purl,
         |       coalesce(up.upgrades, '') AS upgrades,
         |       coalesce(pa.patch_ids, '') AS patch_ids
         |FROM imp
         |LEFT JOIN up ON imp.avid = up.avid AND imp.base_purl = up.base_purl
         |LEFT JOIN pa ON imp.avid = pa.avid
         |ORDER BY imp.avid, imp.base_purl""") { (s, dir) =>
      import s.implicits._
      val links = Tables(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(7)) === 0)
        .select(
          concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
          concat(lit("https://git.example/r"), pmod(col("l_partkey"), lit(5)))
            .as("vcs_url"),
          substring(md5(col("l_partkey").cast("string")), 1, 8)
            .as("commit_hash"))
      val patches = graft.derive.AdvisoryDerive.commitPatchesFromLinks(links,
        Seq.empty[(String, String, String)]
          .toDF("vcs_url", "commit_hash", "patch_text"))
      graft.derive.AdvisoryDerive.mitigations(unfurled(s, dir), patches)
        .select(col("avid"), col("base_purl"),
          array_join(col("upgrade_to_versions"), ",").as("upgrades"),
          array_join(col("patches"), ",").as("patch_ids"))
        .orderBy("avid", "base_purl")
    },

    // with_package_counts (models.py:179-183): the queryset's
    // Count(distinct) annotations per advisory
    q("s12_package_counts",
      s"""WITH u AS ($unfurledSql)
         |SELECT avid,
         |       count(DISTINCT CASE WHEN is_affected
         |                      THEN base_purl || '@' || version END)
         |         AS vulnerable_package_count,
         |       count(DISTINCT CASE WHEN is_fixed
         |                      THEN base_purl || '@' || version END)
         |         AS patched_package_count
         |FROM u GROUP BY avid ORDER BY avid""") { (s, dir) =>
      Serving.advisoryPackageCounts(unfurled(s, dir)).orderBy("avid")
    },

    // Mitigation curation queue (views.py MitigationCuration / the
    // MISSING_FIXED_BY_PACKAGE todo): impacted purls with no fixed-by
    // package, through the real derive function. Uses its own unfurled
    // variant where purls p15-p19 never receive a fix, so the queue is
    // NON-empty (the shared fixture fixes every purl → a structurally
    // 0-row oracle that can't catch a wrong join — r05 verdict #4).
    q("s11_curation_queue",
      """WITH u AS (
        |  SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
        |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
        |         l_quantity > 25 AS is_affected,
        |         l_quantity <= 25 AND l_partkey % 20 < 15 AS is_fixed
        |  FROM lineitem)
        |SELECT avid, base_purl FROM u GROUP BY 1, 2
        |HAVING bool_or(is_affected) AND NOT bool_or(is_fixed)
        |ORDER BY avid, base_purl""".stripMargin) { (s, dir) =>
      val u = Tables(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"),
        (col("l_quantity") > 25).as("is_affected"),
        (col("l_quantity") <= 25 &&
          pmod(col("l_partkey"), lit(20)) < 15).as("is_fixed"))
      graft.derive.AdvisoryDerive.mitigationCurationItems(u)
        .orderBy("avid", "base_purl")
    },

    // Package-type directory (api_v3.py:342-353 PackageTypesView):
    // distinct purl types ordered — the hourly-cached types listing as a
    // one-column distinct over a synthetic packages table from `part`
    q("s13_package_types",
      """SELECT DISTINCT 't' || CAST(p_partkey % 7 AS VARCHAR) AS type
        |FROM part ORDER BY type""") { (s, dir) =>
      val packages = Tables(s, dir, "part")
        .select(concat(lit("t"), pmod(col("p_partkey"), lit(7))).as("type"))
      Serving.packageTypes(packages)
    },

    // Fixed-package details (views.py:438-478 get_fixed_package_details):
    // per advisory the fixed-by versions flagged is_vulnerable (the
    // Exists annotation against the affected set), ghosts excluded —
    // ghost dimension = every p0 version "9" row
    q("s14_fixed_details",
      s"""WITH u AS ($unfurledSql),
         |fixed AS (
         |  SELECT DISTINCT avid, base_purl, version FROM u WHERE is_fixed),
         |nonghost AS (
         |  SELECT * FROM fixed
         |  WHERE NOT (base_purl = 'pkg:npm/p0' AND version = '9')),
         |vuln AS (
         |  SELECT DISTINCT base_purl, version FROM u WHERE is_affected)
         |SELECT f.avid, f.base_purl, f.version,
         |       (v.base_purl IS NOT NULL) AS is_vulnerable
         |FROM nonghost f
         |LEFT JOIN vuln v
         |  ON f.base_purl = v.base_purl AND f.version = v.version
         |ORDER BY f.avid, f.base_purl, f.version""") { (s, dir) =>
      import s.implicits._
      val ghosts = Seq(("pkg:npm/p0", "9")).toDF("base_purl", "version")
      Serving.fixedPackageDetails(unfurled(s, dir), ghosts)
        .select("avid", "base_purl", "version", "is_vulnerable")
        .orderBy("avid", "base_purl", "version")
    },

    // fixed_by_packages (api_v3.py:355-365): per advisory the sorted
    // distinct fixed-by purls as one collect_set aggregation (joined to
    // a string for the hash compare)
    q("s15_fixed_by_purls",
      s"""WITH u AS ($unfurledSql)
         |SELECT avid,
         |       string_agg(DISTINCT base_purl || '@' || version, ','
         |                  ORDER BY base_purl || '@' || version)
         |         AS fixed_by_packages
         |FROM u WHERE is_fixed AND version IS NOT NULL
         |GROUP BY avid ORDER BY avid""") { (s, dir) =>
      Serving.fixedByPackagePurls(unfurled(s, dir))
        .select(col("avid"),
          array_join(col("fixed_by_packages"), ",").as("fixed_by_packages"))
        .orderBy("avid")
    },

    // get_patches_bulk (api_v3.py:474-527): introduced/fixed commit
    // patches per (package, advisory) for a bounded bulk request —
    // synthetic patch links from lineitem, with suppkey-driven nulls so
    // the "neither hash nor url" drop guard is exercised
    q("s16_patches_bulk",
      """WITH pl AS (
        |  SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
        |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
        |         CASE WHEN l_linenumber % 2 = 0 THEN 'fixed'
        |              ELSE 'introduced' END AS patch_kind,
        |         CASE WHEN l_suppkey % 5 = 0 THEN NULL
        |              ELSE md5('c' || CAST(l_suppkey AS VARCHAR)) END
        |           AS commit_hash,
        |         CASE WHEN l_suppkey % 7 = 0 THEN NULL
        |              ELSE 'https://github.com/org/r'
        |                   || CAST(l_suppkey % 30 AS VARCHAR) END AS vcs_url
        |  FROM lineitem)
        |SELECT DISTINCT base_purl, avid, patch_kind, commit_hash, vcs_url
        |FROM pl
        |WHERE base_purl IN ('pkg:npm/p1', 'pkg:npm/p2', 'pkg:npm/p5')
        |  AND avid IN ('adv/1', 'adv/3', 'adv/7')
        |  AND (commit_hash IS NOT NULL OR vcs_url IS NOT NULL)
        |ORDER BY base_purl, avid, patch_kind, commit_hash, vcs_url""") {
      (s, dir) =>
      import s.implicits._
      val patchLinks = Tables(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        when(pmod(col("l_linenumber"), lit(2)) === 0, "fixed")
          .otherwise("introduced").as("patch_kind"),
        when(pmod(col("l_suppkey"), lit(5)) === 0, lit(null))
          .otherwise(md5(concat(lit("c"), col("l_suppkey"))))
          .as("commit_hash"),
        when(pmod(col("l_suppkey"), lit(7)) === 0, lit(null))
          .otherwise(concat(lit("https://github.com/org/r"),
            pmod(col("l_suppkey"), lit(30)))).as("vcs_url"))
      val pkgReq = Seq("pkg:npm/p1", "pkg:npm/p2", "pkg:npm/p5")
        .toDF("base_purl")
      val advReq = Seq("adv/1", "adv/3", "adv/7").toDF("avid")
      Serving.patchesBulk(patchLinks, pkgReq, advReq)
        .orderBy("base_purl", "avid", "patch_kind", "commit_hash", "vcs_url")
    },

    // latest_advisory_purls_pairs, both edges (models.py:2966-2978,
    // 3003-3015)
    q("s9_purl_pairs",
      s"""WITH u AS ($unfurledSql)
         |SELECT DISTINCT u.base_purl || '@' || u.version AS purl, u.avid
         |FROM u JOIN $requestSql
         |  ON u.base_purl = req.base_purl AND u.version = req.version
         |WHERE u.is_affected OR u.is_fixed
         |ORDER BY purl, avid""") { (s, dir) =>
      Serving.advisoryPurlPairs(unfurled(s, dir), request(s), "both")
        .orderBy("purl", "avid")
    },

    // Advisory search cascade (models.py:150-178 VulnerabilityQuerySet
    // .search): exact id → exact alias → id-or-alias icontains →
    // summary-or-reference icontains; first non-empty tier wins. The
    // oracle replays the full cascade with per-tier CTEs and count
    // guards, so a wrong tier order or a broken short-circuit mismatches.
    // Query 'cve-2020-11' skips tiers 1-2 (ids are 'ADV-n'; alias match
    // is case-SENSITIVE in the reference) and wins at tier 3.
    q("s17_search_advisories", searchAdvisoriesOracle("cve-2020-11")) {
      (s, dir) =>
        Serving.searchAdvisories(advisoriesFixture(s, dir), "cve-2020-11")
          .select("advisory_id", "summary").orderBy("advisory_id")
    },

    // Same cascade, last-tier fallback: a word that appears only in the
    // priority-derived summaries, never in ids/aliases/reference ids, so
    // tiers 1-3 all come back empty and tier 4 must win.
    q("s17b_search_advisories_summary", searchAdvisoriesOracle("urgent")) {
      (s, dir) =>
        Serving.searchAdvisories(advisoriesFixture(s, dir), "urgent")
          .select("advisory_id", "summary").orderBy("advisory_id")
    },

    // Package search (models.py:746-764 PackageQuerySet.search), purl
    // branch: the query parses as a purl, qualifiers are stripped but the
    // VERSION kept (plain_purl), then case-insensitive prefix match.
    q("s18_search_packages",
      s"""WITH p AS ($packagesFixtureSql)
         |SELECT package_url FROM p
         |WHERE lower(package_url) LIKE 'pkg:npm/p7@3%'
         |ORDER BY package_url""") { (s, dir) =>
      Serving.searchPackages(packagesFixture(s, dir), "pkg:npm/p7@3?arch=x64")
        .select("package_url").orderBy("package_url")
    },

    // Package search, non-purl branch: free text falls back to icontains.
    q("s18b_search_packages_text",
      s"""WITH p AS ($packagesFixtureSql)
         |SELECT package_url FROM p
         |WHERE lower(package_url) LIKE '%p13%'
         |ORDER BY package_url""") { (s, dir) =>
      Serving.searchPackages(packagesFixture(s, dir), "p13")
        .select("package_url").orderBy("package_url")
    },

    // The composed v3 bulk-packages endpoint (api_v3.py:253-339 +
    // :566-700 + :891-959) as ONE oracled mart: filter_purls →
    // is_vulnerable Exists → per-advisory fixed-by ArrayAgg →
    // AdvisorySet max-severity primary → a canonical nested-JSON
    // response row per requested purl. The component queries
    // (s9/s14/s15/j3/a3/a4/j12) stay green on their own; this row gates
    // the COMPOSITION, byte-for-byte.
    q("s21_v3_bulk",
      s"""WITH u AS ($unfurledVSql),
         |req AS (SELECT base_purl, version,
         |               base_purl || '@' || version AS purl
         |        FROM $requestVSql),
         |sev AS (SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
         |               CAST(max(l_suppkey % 10) AS INT) AS severity
         |        FROM lineitem GROUP BY 1),
         |aff AS (SELECT DISTINCT r.purl, u.avid
         |        FROM u JOIN req r ON u.base_purl = r.base_purl
         |                        AND u.version = r.version
         |        WHERE u.is_affected),
         |fixedby AS (
         |  SELECT u.avid,
         |         list_sort(list_distinct(
         |           list(u.base_purl || '@' || u.version))) AS fixed_by
         |  FROM u
         |  WHERE u.is_fixed AND u.version IS NOT NULL
         |    AND u.avid IN (SELECT avid FROM aff)
         |  GROUP BY u.avid),
         |affent AS (
         |  SELECT a.purl,
         |         string_agg(
         |           '{"advisory_id":"' || a.avid ||
         |           '","fixed_by_packages":[' ||
         |           coalesce(array_to_string(list_transform(f.fixed_by,
         |             x -> '"' || x || '"'), ','), '') || ']}',
         |           ',' ORDER BY
         |           '{"advisory_id":"' || a.avid ||
         |           '","fixed_by_packages":[' ||
         |           coalesce(array_to_string(list_transform(f.fixed_by,
         |             x -> '"' || x || '"'), ','), '') || ']}')
         |           AS affected_entries
         |  FROM aff a LEFT JOIN fixedby f ON f.avid = a.avid
         |  GROUP BY a.purl),
         |fix AS (SELECT DISTINCT r.purl, u.avid
         |        FROM u JOIN req r ON u.base_purl = r.base_purl
         |                        AND u.version = r.version
         |        WHERE u.is_fixed),
         |fixing AS (
         |  SELECT f.purl,
         |         arg_max(f.avid,
         |           lpad(CAST(coalesce(s.severity, 0) AS VARCHAR), 4, '0')
         |             || f.avid) AS primary_avid,
         |         max(coalesce(s.severity, 0)) AS max_severity,
         |         count(DISTINCT f.avid) AS set_size
         |  FROM fix f LEFT JOIN sev s ON s.avid = f.avid
         |  GROUP BY f.purl),
         |nonvuln AS (
         |  SELECT base_purl,
         |         arg_max(version,
         |           CAST(split_part(version, '.', 1) AS INT) * 1000000 +
         |           CAST(split_part(version, '.', 2) AS INT))
         |           AS latest_nonvuln
         |  FROM (SELECT base_purl, version,
         |               max(CASE WHEN is_affected THEN 1 ELSE 0 END) AS ea
         |        FROM u GROUP BY base_purl, version)
         |  WHERE ea = 0 GROUP BY base_purl)
         |SELECT r.purl,
         |       (ae.affected_entries IS NOT NULL) AS is_vulnerable,
         |       '{"purl":"' || r.purl || '","is_vulnerable":' ||
         |       CASE WHEN ae.affected_entries IS NOT NULL THEN 'true'
         |            ELSE 'false' END ||
         |       ',"affected_by_vulnerabilities":[' ||
         |       coalesce(ae.affected_entries, '') ||
         |       '],"fixing_vulnerabilities":' ||
         |       CASE WHEN fx.primary_avid IS NOT NULL THEN
         |         '{"primary":"' || fx.primary_avid || '","severity":' ||
         |         CAST(fx.max_severity AS VARCHAR) || ',"size":' ||
         |         CAST(fx.set_size AS VARCHAR) || '}'
         |       ELSE 'null' END ||
         |       ',"latest_non_vulnerable_version":' ||
         |       CASE WHEN nv.latest_nonvuln IS NOT NULL
         |            THEN '"' || nv.latest_nonvuln || '"'
         |            ELSE 'null' END || '}' AS response
         |FROM req r
         |LEFT JOIN affent ae ON ae.purl = r.purl
         |LEFT JOIN fixing fx ON fx.purl = r.purl
         |LEFT JOIN nonvuln nv ON nv.base_purl = r.base_purl
         |ORDER BY r.purl""") { (s, dir) =>
      val sev = Tables(s, dir, "lineitem")
        .groupBy(concat(lit("adv/"), pmod(col("l_orderkey"), lit(50)))
          .as("avid"))
        .agg(max(pmod(col("l_suppkey"), lit(10))).cast("int").as("severity"))
      Serving.v3BulkPackages(unfurledV(s, dir), sev, requestV(s))
        .orderBy("purl")
    },

    // build_patch_set_map (api_v3.py:528-560): patches per ADVISORY SET
    // = deduped union over member advisories, per kind. Hashes are md5
    // strings (fixed width) so the oracle's string sort equals the
    // engine's struct sort.
    q("s22_patch_set_map",
      """WITH links AS (SELECT
        |    'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
        |    CASE WHEN l_linenumber % 2 = 0 THEN 'introduced'
        |         ELSE 'fixed' END AS patch_kind,
        |    md5(CAST(l_partkey % 97 AS VARCHAR)) AS commit_hash,
        |    'https://git.example/r' || CAST(l_suppkey % 7 AS VARCHAR)
        |      AS vcs_url
        |  FROM lineitem),
        |members AS (SELECT DISTINCT
        |    o_orderkey % 30 AS set_id,
        |    'adv/' || CAST(o_custkey % 50 AS VARCHAR) AS avid
        |  FROM orders)
        |SELECT m.set_id, l.patch_kind,
        |       array_to_string(list_sort(list_distinct(
        |         list(l.commit_hash || '|' || l.vcs_url))), ',')
        |         AS patches
        |FROM members m JOIN links l USING (avid)
        |GROUP BY m.set_id, l.patch_kind
        |ORDER BY set_id, patch_kind""") { (s, dir) =>
      // distinct the LONG pre-images first, synthesize strings after:
      // patchSetMap dedups anyway (collect_set), so the distinct is
      // lossless — but keyed on 4 narrow longs (≤50·2·97·7 groups) the
      // partial agg in the serial scan stage is cheap and the exchange
      // narrow (§2.3), and the 600k md5/concat evaluations collapse to
      // one per distinct row, computed post-shuffle across all cores.
      // coalesce pins the TPC-H NOT NULL columns non-nullable (Spark
      // reads every parquet column nullable): without the pin, the
      // operator's truthiness filter and the join-key constraint push
      // back through the barrier as isnotnull(md5(..))/isnotnull(
      // concat(..)) over every RAW row — per-row md5 inside the serial
      // scan stage for a predicate that can never be false (the r19
      // after-plan's step (9)). Non-nullable inputs let NullPropagation
      // fold those IsNotNulls to true, so the scan filter disappears
      // instead of hashing 600k rows (§1.2 per-task work).
      val links = Tables(s, dir, "lineitem").select(
          pmod(coalesce(col("l_orderkey"), lit(0L)), lit(50)).as("_a"),
          pmod(coalesce(col("l_linenumber"), lit(0)), lit(2)).as("_k"),
          pmod(coalesce(col("l_partkey"), lit(0L)), lit(97)).as("_c"),
          pmod(coalesce(col("l_suppkey"), lit(0L)), lit(7)).as("_v"))
        .distinct()
        // repartition barrier: without it CollapseProject merges the
        // string synthesis INTO the aggregate keys and the md5 runs per
        // raw row again (verified in the first after-plan); the exchange
        // carries only the distinct long tuples
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          concat(lit("adv/"), col("_a")).as("avid"),
          when(col("_k") === 0, "introduced").otherwise("fixed")
            .as("patch_kind"),
          md5(col("_c").cast("string")).as("commit_hash"),
          concat(lit("https://git.example/r"), col("_v")).as("vcs_url"))
      val members = Tables(s, dir, "orders").select(
        pmod(coalesce(col("o_orderkey"), lit(0L)), lit(30)).as("set_id"),
        concat(lit("adv/"), pmod(coalesce(col("o_custkey"), lit(0L)),
          lit(50))).as("avid"))
        .distinct()
      Serving.patchSetMap(links, members)
        .withColumn("patches", concat_ws(",",
          expr("transform(patches, p -> p.commit_hash || '|' || p.vcs_url)")))
        .orderBy("set_id", "patch_kind")
    },

    // Per-set SSVC trees (api_v3.py:692-704): union members' SSVC rows,
    // one per source_url (least (avid, vector) member wins), trees
    // sorted by source_url.
    q("s23_ssvc_set_trees",
      """WITH ssvc AS (SELECT
        |    'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
        |    'E:' || CAST(l_linenumber AS VARCHAR) AS vector,
        |    CASE WHEN l_quantity > 25 THEN 'Act' ELSE 'Track' END
        |      AS decision,
        |    'o' || CAST(l_suppkey % 3 AS VARCHAR) AS options,
        |    'https://ssvc.example/s' || CAST(l_partkey % 9 AS VARCHAR)
        |      AS source_url
        |  FROM lineitem),
        |members AS (SELECT DISTINCT
        |    o_orderkey % 30 AS set_id,
        |    'adv/' || CAST(o_custkey % 50 AS VARCHAR) AS avid
        |  FROM orders),
        |per_src AS (
        |  SELECT m.set_id, s.source_url,
        |         arg_min(s.vector || '|' || s.decision || '|' || s.options,
        |                 s.avid || CHR(1) || s.vector || CHR(1) ||
        |                 s.decision || CHR(1) || s.options) AS t
        |  FROM members m JOIN ssvc s USING (avid)
        |  GROUP BY m.set_id, s.source_url)
        |SELECT set_id,
        |       array_to_string(list_sort(list(source_url || '|' || t)), ',')
        |         AS trees
        |FROM per_src GROUP BY set_id ORDER BY set_id""") { (s, dir) =>
      // same treatment as s22: distinct the long/bool pre-images first
      // (≤50·7·2·3·9 groups; min-struct aggregation downstream is
      // multiplicity-insensitive so the distinct is lossless), then
      // synthesize the strings once per distinct row post-shuffle.
      // coalesce = the s22 NOT-NULL pin: folds the join-key isnotnull(
      // concat(..)) constraint out of the raw-row scan filter
      val ssvc = Tables(s, dir, "lineitem").select(
          pmod(coalesce(col("l_orderkey"), lit(0L)), lit(50)).as("_a"),
          coalesce(col("l_linenumber"), lit(0)).as("_ln"),
          (coalesce(col("l_quantity"), lit(0d)) > 25).as("_act"),
          pmod(coalesce(col("l_suppkey"), lit(0L)), lit(3)).as("_o"),
          pmod(coalesce(col("l_partkey"), lit(0L)), lit(9)).as("_s"))
        .distinct()
        // repartition barrier — see s22: keeps the synthesis out of the
        // aggregate keys (CollapseProject) so it runs once per distinct
        // long tuple, post-shuffle
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          concat(lit("adv/"), col("_a")).as("avid"),
          concat(lit("E:"), col("_ln")).as("vector"),
          when(col("_act"), "Act").otherwise("Track").as("decision"),
          concat(lit("o"), col("_o")).as("options"),
          concat(lit("https://ssvc.example/s"), col("_s"))
            .as("source_url"))
      val members = Tables(s, dir, "orders").select(
        pmod(col("o_orderkey"), lit(30)).as("set_id"),
        concat(lit("adv/"), pmod(col("o_custkey"), lit(50))).as("avid"))
        .distinct()
      Serving.ssvcSetTrees(ssvc, members)
        .withColumn("trees", concat_ws(",", expr(
          "transform(ssvc_trees, t -> t.source_url || '|' || t.vector" +
            " || '|' || t.decision || '|' || t.options)")))
        .select("set_id", "trees")
        .orderBy("set_id")
    },

    // max_advisories response gate (api_v3.py:795-805): a purl whose
    // advisory count exceeds the cap answers a NULL sentinel, not a
    // truncated list. Cap 5 sits inside the fixture's count spread so
    // both branches appear.
    q("s24_capped_advisories",
      s"""WITH u AS (
         |  SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
         |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR)
         |           AS base_purl,
         |         CAST(l_linenumber AS VARCHAR) AS version,
         |         l_quantity > 25
         |           AND l_orderkey % 50 < l_partkey % 20 + 3
         |           AS is_affected
         |  FROM lineitem),
         |req AS (SELECT base_purl, version,
         |               base_purl || '@' || version AS purl
         |        FROM (VALUES ('pkg:npm/p1','1'),('pkg:npm/p2','3'),
         |                     ('pkg:npm/p5','2'),('pkg:npm/p7','4'))
         |          AS r(base_purl, version)),
         |pairs AS (
         |  SELECT DISTINCT r.purl, u.avid
         |  FROM u JOIN req r ON u.base_purl = r.base_purl
         |                   AND u.version = r.version
         |  WHERE u.is_affected),
         |g AS (SELECT purl, list_sort(list(avid)) AS avids,
         |             count(*) AS n
         |      FROM pairs GROUP BY purl)
         |SELECT purl,
         |       CASE WHEN n > 5 THEN NULL
         |            ELSE array_to_string(avids, ',') END AS advisories,
         |       n > 5 AS overflow
         |FROM g ORDER BY purl""") { (s, dir) =>
      val sp = s
      import sp.implicits._
      val req = Seq(("pkg:npm/p1", "1"), ("pkg:npm/p2", "3"),
        ("pkg:npm/p5", "2"), ("pkg:npm/p7", "4"))
        .toDF("base_purl", "version")
      // structure-determined counts (purl p<k> is affected by ~k+3
      // advisories regardless of SF) so BOTH gate branches appear
      val u = Tables(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"),
        (col("l_quantity") > 25 &&
          pmod(col("l_orderkey"), lit(50)) <
            pmod(col("l_partkey"), lit(20)) + 3).as("is_affected"),
        lit(false).as("is_fixed"))
      Serving.cappedAdvisoriesPerPurl(u, req, 5)
        .withColumn("advisories", concat_ws(",", col("advisories")))
        .withColumn("advisories",
          when(col("overflow"), lit(null)).otherwise(col("advisories")))
        .orderBy("purl")
    },

    // all-vulnerable-purls dump (api_v3.py:268-272 empty-purls POST +
    // models.py:3693-3704): the package table semi-joined to the
    // affected edge; packages divisible by 3 also exist in a
    // ?arch-qualified spelling, so the dump carries both spellings
    q("s25_all_vulnerable_purls",
      s"""WITH u AS ($unfurledSql),
         |pk AS (
         |  SELECT DISTINCT
         |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR)
         |           AS base_purl,
         |         CAST(l_linenumber AS VARCHAR) AS version,
         |         CASE WHEN l_partkey % 3 = 0 THEN '?arch=x'
         |              ELSE '' END AS quals
         |  FROM lineitem),
         |vuln AS (SELECT DISTINCT base_purl, version FROM u
         |         WHERE is_affected)
         |SELECT pk.base_purl || '@' || pk.version || pk.quals
         |         AS package_url
         |FROM pk JOIN vuln ON pk.base_purl = vuln.base_purl
         |                 AND pk.version = vuln.version
         |ORDER BY package_url""") { (s, dir) =>
      Serving.allVulnerablePurls(packageV2Fixture(s, dir),
        unfurled(s, dir)).orderBy("package_url")
    },

    // details=false + ignore_qualifiers_subpath=true POST
    // (api_v3.py:276-315): queried purls strip to their plain form,
    // match plain_package_url, and only the vulnerable ones answer —
    // one row per matching package row (the qualified and plain
    // spellings of one plain purl both answer, like values_list)
    q("s26_vulnerable_plain_purls",
      s"""WITH u AS ($unfurledSql),
         |pk AS (
         |  SELECT DISTINCT
         |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR)
         |           AS base_purl,
         |         CAST(l_linenumber AS VARCHAR) AS version
         |  FROM lineitem),
         |pkrows AS (
         |  SELECT base_purl, version,
         |         base_purl || '@' || version AS plain_package_url
         |  FROM pk),
         |req AS (SELECT * FROM (VALUES ('pkg:npm/p1@1'),
         |          ('pkg:npm/p2@3'),('pkg:npm/p5@2'),('pkg:npm/p19@6'))
         |          AS r(q)),
         |vuln AS (SELECT DISTINCT base_purl, version FROM u
         |         WHERE is_affected)
         |SELECT p.plain_package_url AS purl
         |FROM pkrows p
         |JOIN req r ON p.plain_package_url = r.q
         |JOIN vuln v ON p.base_purl = v.base_purl
         |           AND p.version = v.version
         |ORDER BY purl""") { (s, dir) =>
      val sp = s
      import sp.implicits._
      // queried purls carry qualifiers/subpath noise the endpoint strips
      val purls = Seq("pkg:npm/p1@1?arch=x86&distro=sid",
        "pkg:npm/p2@3", "pkg:npm/p5@2#sub/path", "pkg:npm/p19@6")
        .toDF("purl")
      // one package row per plain purl (the fixture's package table has
      // a single spelling here; multi-spelling fan-out is s25's case)
      val pk = Tables(s, dir, "lineitem").select(
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"))
        .distinct()
        .withColumn("plain_package_url",
          concat(col("base_purl"), lit("@"), col("version")))
      Serving.vulnerablePlainPurlsOf(pk, unfurled(s, dir), purls)
        .orderBy("purl")
    },
  )

  /** PackageV2-shaped rows from lineitem: one plain spelling per
    * (base, version), plus an ?arch-qualified spelling for partkeys
    * divisible by 3 (distinct rows, like real packages that differ only
    * in qualifiers). */
  private def packageV2Fixture(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      when(pmod(col("l_partkey"), lit(3)) === 0, "?arch=x")
        .otherwise("").as("quals"))
      .distinct()
      .select(col("base_purl"), col("version"),
        concat(col("base_purl"), lit("@"), col("version"), col("quals"))
          .as("package_url"),
        concat(col("base_purl"), lit("@"), col("version"))
          .as("plain_package_url"))

  /** Synthetic advisories with ids, two aliases, references, and a
    * summary, derived from `orders` — enough surface for every search
    * tier. Mirrors [[advisoriesFixtureSql]] column for column.
    * FanOut BEFORE the synthesis: searchAdvisories' tier tagging runs
    * interpreted higher-order functions (`exists` over the alias /
    * reference arrays) per row, and a single-row-group scan otherwise
    * evaluates them serially on one core for both cascade passes
    * (no-op at scale — the guard; the shuffle carries the two raw
    * longs + priority, not the synthesized arrays). */
  private def advisoriesFixture(s: SparkSession, dir: String): DataFrame =
    graft.core.FanOut(Tables(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority")).select(
      concat(lit("ADV-"), col("o_orderkey")).as("advisory_id"),
      array(concat(lit("CVE-2020-"), col("o_custkey")),
        concat(lit("GHSA-"), pmod(col("o_orderkey"), lit(97))))
        .as("aliases"),
      array(struct(
        concat(lit("REF-"), pmod(col("o_orderkey"), lit(31)))
          .as("reference_id"))).as("references"),
      concat(col("o_orderpriority"), lit(" order "), col("o_orderkey"))
        .as("summary"),
      lit(true).as("is_latest"))

  private def advisoriesFixtureSql: String =
    """SELECT 'ADV-' || CAST(o_orderkey AS VARCHAR) AS advisory_id,
      |       'CVE-2020-' || CAST(o_custkey AS VARCHAR) AS a1,
      |       'GHSA-' || CAST(o_orderkey % 97 AS VARCHAR) AS a2,
      |       'REF-' || CAST(o_orderkey % 31 AS VARCHAR) AS ref1,
      |       o_orderpriority || ' order ' || CAST(o_orderkey AS VARCHAR)
      |         AS summary
      |FROM orders""".stripMargin

  /** The cascade as pure SQL: per-tier CTEs; tier N emits only when all
    * earlier tiers are empty (the reference's exists() short-circuit). */
  private def searchAdvisoriesOracle(query: String): String = {
    val ql = query.toLowerCase
    s"""WITH adv AS ($advisoriesFixtureSql),
       |t1 AS (SELECT advisory_id, summary FROM adv
       |       WHERE advisory_id = '$query'),
       |t2 AS (SELECT advisory_id, summary FROM adv
       |       WHERE a1 = '$query' OR a2 = '$query'),
       |t3 AS (SELECT advisory_id, summary FROM adv
       |       WHERE lower(advisory_id) LIKE '%$ql%'
       |          OR lower(a1) LIKE '%$ql%' OR lower(a2) LIKE '%$ql%'),
       |t4 AS (SELECT advisory_id, summary FROM adv
       |       WHERE lower(summary) LIKE '%$ql%'
       |          OR lower(ref1) LIKE '%$ql%')
       |SELECT advisory_id, summary FROM (
       |  SELECT * FROM t1
       |  UNION ALL
       |  SELECT * FROM t2 WHERE (SELECT count(*) FROM t1) = 0
       |  UNION ALL
       |  SELECT * FROM t3 WHERE (SELECT count(*) FROM t1) = 0
       |                     AND (SELECT count(*) FROM t2) = 0
       |  UNION ALL
       |  SELECT * FROM t4 WHERE (SELECT count(*) FROM t1) = 0
       |                     AND (SELECT count(*) FROM t2) = 0
       |                     AND (SELECT count(*) FROM t3) = 0)
       |ORDER BY advisory_id""".stripMargin
  }

  /** Synthetic packages table from `part`: 30 names × 7 versions. */
  private def packagesFixture(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      concat(lit("pkg:npm/p"), pmod(col("p_partkey"), lit(30)),
        lit("@"), pmod(col("p_partkey"), lit(7))).as("package_url"))

  // NB: no line may START with '||' — q() re-applies stripMargin to the
  // assembled oracle and would eat one pipe of a leading concat operator.
  private def packagesFixtureSql: String =
    """SELECT 'pkg:npm/p' || CAST(p_partkey % 30 AS VARCHAR) ||
      |       '@' || CAST(p_partkey % 7 AS VARCHAR) AS package_url
      |FROM part""".stripMargin
}
