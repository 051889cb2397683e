package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.derive.VulnerabilityV1

/** SURVEY §2 V1-model coverage — the reference's vulnerability-centric
  * surface (models.py:246-321 Vulnerability, models.py:697-733 V1
  * package querysets, pipes/group_advisories.py:24-104 set
  * materialization) exercised through the REAL derive paths over a
  * synthetic advisory log, with DuckDB re-deriving the alias-connected
  * components via a recursive CTE (the d2 label-propagation oracle
  * pattern) and the VCID via the shared [[VulnerabilityV1.vcidSql]]
  * formulation.
  *
  * Fixture shape: one advisory per distinct `o_orderkey % 500` (bounded
  * at every SF so the oracle recursion depth stays trivial), two alias
  * families (`AL-` mod-250 and `BL-` div-2) that tie each even k into a
  * 4-advisory diamond {k, k+1, k+250, k+251} — components that need
  * genuine multi-hop propagation, 125 of them, with per-advisory
  * numeric severities, an EPSS donor every 11th and an exploit
  * reference every 13th so the exploitability ladder's rungs all fire.
  */
object V1Queries extends QueryModule {

  // --- shared synthetic advisory log ---------------------------------

  private def advisories(s: SparkSession, dir: String): DataFrame = {
    val refType = "array<struct<reference_id:string,reference_type:string," +
      "url:string>>"
    Tables(s, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(500)).as("k")).distinct()
      .select(
        concat(lit("adv/"), col("k")).as("avid"),
        concat(lit("ADV-"), col("k")).as("advisory_id"),
        lit(true).as("is_latest"),
        pmod(col("k"), lit(7)).as("precedence"),
        concat(lit("summary "), col("k")).as("summary"),
        array(
          concat(lit("AL-"), pmod(col("k"), lit(250))),
          concat(lit("BL-"), expr("k div 2"))).as("aliases"),
        when(pmod(col("k"), lit(11)) === 0, array(
          struct(lit("generic").as("scoring_system"),
            pmod(col("k"), lit(10)).cast("string").as("value"),
            lit("").as("scoring_elements"),
            lit("https://sev.example/s").as("url")),
          struct(lit("epss").as("scoring_system"),
            lit("0.88").as("value"), lit("").as("scoring_elements"),
            lit("https://epss.example/e").as("url"))))
          .otherwise(array(
            struct(lit("generic").as("scoring_system"),
              pmod(col("k"), lit(10)).cast("string").as("value"),
              lit("").as("scoring_elements"),
              lit("https://sev.example/s").as("url")))).as("severities"),
        when(pmod(col("k"), lit(13)) === 0, array(
          struct(lit("r1").as("reference_id"),
            lit("exploit").as("reference_type"),
            lit("https://exploit.example/x").as("url"))))
          .otherwise(array().cast(refType)).as("references"))
  }

  /** Membership for the s19/s20/d4 trio, computed FRESH per query.
    * A round-10 memo cached the collected rows across the trio, which
    * made the bench accounting non-deterministic: whichever trio query
    * ran FIRST absorbed the whole orders scan + label propagation (d4,
    * with its 0.12 s base, showed 46× at the 10× rehearsal purely from
    * that scheduling). Each query now pays its own derivation — the
    * cost is scan-dominated (the 500-advisory fixture derives its keys
    * from a full pass over orders) and therefore scales linearly, so
    * per-query ratios reflect the operator. This is fixture wiring,
    * not the library path: for real corpora Engine.runAdvisoryPipeline
    * shares the live membership DataFrame across its consumers
    * (Engine.scala `v1Member`). */
  private def member(s: SparkSession, dir: String): DataFrame =
    VulnerabilityV1.membership(s, advisories(s, dir).localCheckpoint())

  /** Recursive-CTE prelude shared by the three oracles: advisories,
    * their alias edges, min-label propagation to components, the
    * per-component canonical key (min alias) and primary (precedence
    * desc, avid-string asc — advisorySets' exact ordering). */
  private val ccSql =
    """o AS (SELECT DISTINCT o_orderkey % 500 AS k FROM orders),
      |alias AS (
      |  SELECT k, 'AL-' || CAST(k % 250 AS VARCHAR) AS a FROM o
      |  UNION ALL
      |  SELECT k, 'BL-' || CAST(k // 2 AS VARCHAR) AS a FROM o),
      |amin AS (SELECT a, min(k) AS root FROM alias GROUP BY a),
      |edges AS (
      |  SELECT DISTINCT al.k AS src, am.root AS dst
      |  FROM alias al JOIN amin am USING (a) WHERE al.k <> am.root),
      |sym AS (SELECT src, dst FROM edges
      |        UNION SELECT dst AS src, src AS dst FROM edges),
      |lbl(node, comp, i) AS (
      |  SELECT k AS node, k AS comp, 0 AS i FROM o
      |  UNION ALL
      |  SELECT s.src AS node, min(l.comp) AS comp, l.i + 1 AS i
      |  FROM lbl l JOIN sym s ON l.node = s.dst
      |  WHERE l.i < 100
      |  GROUP BY s.src, l.i),
      |comp AS (SELECT node AS k, min(comp) AS comp FROM lbl GROUP BY node),
      |vkey AS (SELECT c.comp, min(a.a) AS vuln_key
      |         FROM comp c JOIN alias a ON a.k = c.k GROUP BY c.comp),
      |prim AS (SELECT comp, k AS pk FROM (
      |  SELECT c.comp, c.k,
      |         row_number() OVER (PARTITION BY c.comp
      |           ORDER BY c.k % 7 DESC, 'adv/' || CAST(c.k AS VARCHAR)) AS rn
      |  FROM comp c) WHERE rn = 1)""".stripMargin

  /** Per-advisory risk factors in SQL, mirroring AdvisoryDerive
    * .advisoryRisk over the fixture: numeric severity value × default
    * weight 5 / 10, rounded per advisory; exploitability ladder
    * high-EPSS → exploit reference → default. */
  private val riskSql =
    """sev AS (
      |  SELECT k, CAST(k % 10 AS VARCHAR) AS value, 'generic' AS ss FROM o
      |  UNION ALL
      |  SELECT k, '0.88' AS value, 'epss' AS ss FROM o WHERE k % 11 = 0),
      |advrisk AS (
      |  SELECT k,
      |         round(max(CAST(value AS DOUBLE) * 5 / 10), 1) AS ws,
      |         CASE WHEN max(CASE WHEN ss = 'epss'
      |                            AND CAST(value AS DOUBLE) > 0.8
      |                       THEN 1 ELSE 0 END) = 1 THEN 2.0
      |              WHEN k % 13 = 0 THEN 1.0
      |              ELSE 0.5 END AS ex
      |  FROM sev GROUP BY k)""".stripMargin

  private def unfurled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(500))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  private val unfurledSql =
    """u AS (SELECT l_orderkey % 500 AS k,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       CAST(l_linenumber AS VARCHAR) AS version,
      |       l_quantity > 25 AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem)""".stripMargin

  override val entries: Seq[QueryEntry] = Seq(

    // V1 Vulnerability mart (models.py:246-321): alias-connected
    // advisory components → deterministic VCID, union aliases, primary
    // summary, PUBLISHED status, vulnerability-grain risk trio.
    q("s19_v1_vulnerabilities",
      s"""WITH RECURSIVE
         |$ccSql,
         |$riskSql,
         |als AS (SELECT comp, string_agg(a, ',' ORDER BY a) AS aliases_csv
         |        FROM (SELECT DISTINCT c.comp, a.a
         |              FROM comp c JOIN alias a ON a.k = c.k)
         |        GROUP BY comp),
         |vf AS (SELECT c.comp,
         |              max(r.ws) AS weighted_severity,
         |              max(r.ex) AS exploitability
         |       FROM comp c JOIN advrisk r USING (k) GROUP BY c.comp)
         |SELECT ${VulnerabilityV1.vcidSql("v.vuln_key")} AS vulnerability_id,
         |       als.aliases_csv,
         |       'summary ' || CAST(p.pk AS VARCHAR) AS summary,
         |       1 AS status,
         |       vf.weighted_severity, vf.exploitability,
         |       CASE WHEN vf.weighted_severity > 0
         |            THEN round(least(vf.weighted_severity
         |                             * vf.exploitability, 10), 1)
         |       END AS risk_score
         |FROM vkey v
         |JOIN prim p USING (comp)
         |JOIN als USING (comp)
         |JOIN vf USING (comp)
         |ORDER BY vulnerability_id""") { (s, dir) =>
      // one checkpointed fixture feeds both the membership derivation
      // and the vulnerability assembly — per-query cost, single scan
      val adv = advisories(s, dir).localCheckpoint()
      VulnerabilityV1.vulnerabilities(s, adv,
          precomputedMembership = Some(VulnerabilityV1.membership(s, adv)))
        .select(col("vulnerability_id"),
          array_join(col("aliases"), ",").as("aliases_csv"),
          col("summary"), col("status"),
          col("weighted_severity"), col("exploitability"),
          col("risk_score"))
        .orderBy("vulnerability_id")
    },

    // S27 — the v2 package list (api_v2.py:192-330 PackageV2Serializer,
    // captured expectations tests/test_api_v2.py:216-475, golden-pinned
    // in CapturedApiSpec part 5): per concrete package the
    // affected_by_vulnerabilities dict (VCID + the vulnerability's
    // first fixed-by purl, min-purl deterministic), the fixing VCIDs,
    // next/latest non-vulnerable versions and the package risk score.
    // The oracle re-derives VCIDs via the recursive CC + vcidSql, the
    // safe-version walk numerically (single-digit versions: numeric ==
    // semver order) and package risk as max affecting-advisory risk.
    q("s27_v2_package_list",
      s"""WITH RECURSIVE
         |$ccSql,
         |$riskSql,
         |$unfurledSql,
         |rs AS (SELECT k, CASE WHEN ws > 0
         |         THEN round(least(ws * ex, 10), 1) END AS risk
         |       FROM advrisk),
         |vc AS (SELECT c.k, ${VulnerabilityV1.vcidSql("v.vuln_key")}
         |         AS vcid
         |       FROM comp c JOIN vkey v USING (comp)),
         |fb AS (SELECT vc.vcid,
         |         min(u.base_purl || '@' || u.version) AS fixed_by
         |       FROM u JOIN vc USING (k)
         |       WHERE u.is_fixed AND u.version IS NOT NULL
         |       GROUP BY vc.vcid),
         |pkg AS (SELECT DISTINCT base_purl, version FROM u),
         |aff AS (SELECT u.base_purl, u.version, vc.vcid
         |        FROM u JOIN vc USING (k) WHERE u.is_affected
         |        GROUP BY u.base_purl, u.version, vc.vcid),
         |affcsv AS (SELECT a.base_purl, a.version,
         |             string_agg(a.vcid || ':' ||
         |               coalesce(f.fixed_by, '-'), ',' ORDER BY a.vcid)
         |               AS affected_csv
         |           FROM aff a LEFT JOIN fb f ON f.vcid = a.vcid
         |           GROUP BY a.base_purl, a.version),
         |fixd AS (SELECT DISTINCT u.base_purl, u.version, vc.vcid
         |         FROM u JOIN vc USING (k) WHERE u.is_fixed),
         |fixcsv AS (SELECT base_purl, version,
         |             string_agg(vcid, ',' ORDER BY vcid) AS fixing_csv
         |           FROM fixd GROUP BY base_purl, version),
         |vuln AS (SELECT DISTINCT base_purl, version FROM u
         |         WHERE is_affected),
         |pk AS (SELECT p.base_purl, p.version,
         |         CAST(p.version AS INT) AS vi,
         |         EXISTS(SELECT 1 FROM vuln v
         |           WHERE v.base_purl = p.base_purl
         |             AND v.version = p.version) AS is_vuln
         |       FROM pkg p),
         |nv AS (SELECT a.base_purl, a.version,
         |         min(CASE WHEN NOT b.is_vuln AND b.vi > a.vi
         |                  THEN b.vi END) AS nxt,
         |         max(CASE WHEN NOT b.is_vuln AND b.vi > a.vi
         |                  THEN b.vi END) AS lst
         |       FROM pk a JOIN pk b USING (base_purl)
         |       GROUP BY a.base_purl, a.version),
         |prisk AS (SELECT u.base_purl, u.version,
         |            round(max(r.risk), 1) AS risk_score
         |          FROM u JOIN rs r USING (k) WHERE u.is_affected
         |          GROUP BY u.base_purl, u.version)
         |SELECT p.base_purl || '@' || p.version AS purl,
         |       coalesce(ac.affected_csv, '') AS affected_csv,
         |       coalesce(fc.fixing_csv, '') AS fixing_csv,
         |       CAST(n.nxt AS VARCHAR) AS next_v,
         |       CAST(n.lst AS VARCHAR) AS latest_v,
         |       pr.risk_score
         |FROM pkg p
         |LEFT JOIN affcsv ac USING (base_purl, version)
         |LEFT JOIN fixcsv fc USING (base_purl, version)
         |LEFT JOIN nv n ON n.base_purl = p.base_purl
         |              AND n.version = p.version
         |LEFT JOIN prisk pr ON pr.base_purl = p.base_purl
         |                  AND pr.version = p.version
         |ORDER BY purl""") { (s, dir) =>
      val adv = advisories(s, dir).localCheckpoint()
      val unf = unfurled(s, dir)
      val pkgs = unf.select("base_purl", "version").distinct()
      val mem = VulnerabilityV1.membership(s, adv)
      val risk = graft.derive.AdvisoryDerive.advisoryRisk(adv)
      graft.serve.PackageV2
        .packageList(pkgs, unf, mem, advisoryRisk = Some(risk))
        .select(col("purl"),
          array_join(expr("transform(affected_by_vulnerabilities, " +
            "x -> x.vulnerability_id || ':' || " +
            "coalesce(x.fixed_by_packages, '-'))"), ",")
            .as("affected_csv"),
          array_join(col("fixing_vulnerabilities"), ",").as("fixing_csv"),
          col("next_non_vulnerable_version").as("next_v"),
          col("latest_non_vulnerable_version").as("latest_v"),
          col("risk_score"))
        .orderBy("purl")
    },

    // S28 — the CodeFixV2 list endpoint (api_v2.py:679-696
    // CodeFixV2ViewSet; captured expectations test_api_v2.py:860-913,
    // pinned in CapturedApiSpec part 5): the d20 code-fix mart in the
    // CodeFixV2Serializer field names, with the viewset's advisory_id
    // query-param filter exercised in three variants — unfiltered list,
    // a present avid ('adv/0' — the mart's min-avid first-wins rule
    // makes low avids the claimed ones), and an unknown avid (must
    // yield an empty page, not an error; the hash gates that the
    // 'none' variant contributes zero rows). The mart checkpoints once
    // and each variant is a pushed-down predicate over it — the
    // request-bounded serving shape.
    q("s28_v2_code_fixes",
      """WITH r AS (
        |  SELECT 'adv/' || CAST(o_orderkey % 50 AS VARCHAR) AS avid,
        |         CASE
        |           WHEN o_orderkey % 4 = 0 THEN
        |             'https://github.com/org/r' ||
        |             CAST(o_orderkey % 7 AS VARCHAR) || '/commit/' ||
        |             substring(md5(CAST(o_orderkey % 8 AS VARCHAR)), 1, 8)
        |           WHEN o_orderkey % 4 = 1 THEN
        |             'git://github.com/org/r' ||
        |             CAST(o_orderkey % 7 AS VARCHAR) || '/commit/' ||
        |             substring(md5(CAST(o_orderkey % 8 AS VARCHAR)), 1, 8)
        |           WHEN o_orderkey % 4 = 2 THEN
        |             'https://example.com/advisory/' ||
        |             CAST(o_orderkey AS VARCHAR)
        |           ELSE 'ftp://host/commit/deadbeef' END AS url
        |  FROM orders),
        |norm AS (
        |  SELECT avid, trim(url) AS vcs_url
        |  FROM r
        |  WHERE url LIKE '%/commit/%'
        |    AND regexp_matches(url,
        |      '^(git\+)?(https?|git|hg|svn)(\+https?|\+git)?://')),
        |first AS (SELECT vcs_url, min(avid) AS avid FROM norm
        |          GROUP BY vcs_url),
        |aff AS (
        |  SELECT DISTINCT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR)
        |           AS avid,
        |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) || '@' ||
        |           CAST(l_linenumber AS VARCHAR) AS affected_package
        |  FROM lineitem WHERE l_quantity > 25),
        |mart AS (
        |  SELECT f.avid AS affected_advisory_id,
        |         f.vcs_url AS commits_csv,
        |         a.affected_package AS affected_package_purl
        |  FROM first f JOIN aff a USING (avid))
        |SELECT * FROM (
        |  SELECT 'all' AS variant, * FROM mart
        |  UNION ALL
        |  SELECT 'one' AS variant, * FROM mart
        |  WHERE affected_advisory_id = 'adv/0'
        |  UNION ALL
        |  SELECT 'none' AS variant, * FROM mart
        |  WHERE affected_advisory_id = 'adv/999')
        |ORDER BY variant, affected_advisory_id, affected_package_purl,
        |         commits_csv""") { (s, dir) =>
      val okey = col("o_orderkey")
      val commit = substring(md5(pmod(okey, lit(8)).cast("string")), 1, 8)
      val refs = Tables(s, dir, "orders").select(
        concat(lit("adv/"), pmod(okey, lit(50))).as("avid"),
        when(pmod(okey, lit(4)) === 0,
          concat(lit("https://github.com/org/r"), pmod(okey, lit(7)),
            lit("/commit/"), commit))
          .when(pmod(okey, lit(4)) === 1,
            concat(lit("git://github.com/org/r"), pmod(okey, lit(7)),
              lit("/commit/"), commit))
          .when(pmod(okey, lit(4)) === 2,
            concat(lit("https://example.com/advisory/"), okey))
          .otherwise(lit("ftp://host/commit/deadbeef")).as("url"))
      val unf = Tables(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"),
        (col("l_quantity") > 25).as("is_affected"))
      val mart = graft.derive.AdvisoryDerive
        .codeFixesFromLinks(refs, unf).localCheckpoint()
      def page(v: String, advisoryId: Option[String]) =
        graft.serve.PackageV2.v2CodeFixes(mart, advisoryId).select(
          lit(v).as("variant"), col("affected_advisory_id"),
          array_join(col("commits"), ",").as("commits_csv"),
          col("affected_package_purl"))
      page("all", None)
        .unionAll(page("one", Some("adv/0")))
        .unionAll(page("none", Some("adv/999")))
        .orderBy("variant", "affected_advisory_id",
          "affected_package_purl", "commits_csv")
    },

    // V1 package querysets (models.py:697-733): per concrete package
    // the distinct vulnerabilities affecting / fixed by it — the
    // with_vulnerability_counts annotations; `vulnerable`/`fixing` are
    // count>0 filters over this.
    q("s20_v1_package_vulns",
      s"""WITH RECURSIVE
         |$ccSql,
         |$unfurledSql
         |SELECT u.base_purl, u.version,
         |       count(DISTINCT CASE WHEN u.is_affected THEN c.comp END)
         |         AS vulnerability_count,
         |       count(DISTINCT CASE WHEN u.is_fixed THEN c.comp END)
         |         AS patched_vulnerability_count
         |FROM u JOIN comp c USING (k)
         |GROUP BY u.base_purl, u.version
         |ORDER BY u.base_purl, u.version""") { (s, dir) =>
      VulnerabilityV1
        .packageVulnerabilityCounts(unfurled(s, dir), member(s, dir))
        .orderBy("base_purl", "version")
    },

    // D4/D5 — AdvisorySet materialization (pipes/group_advisories.py:
    // 24-104): per-advisory set membership with the set's canonical
    // alias key and precedence primary, through the REAL advisorySets
    // label propagation (hash component ids never surface — the stable
    // key does).
    // A15 — the advisory-side END-TO-END hash gate (round-14 directive
    // #4), mirroring x_curation_ledger: one narrow row per latest
    // advisory through the COMPOSED chain ingest log →
    // content-id/latest → impacts → unfurl → risk trio → alias sets →
    // serving package counts (Engine.advisoryLedger). The oracle
    // re-derives every stage independently: the canonical content
    // sha256 (contentIdColumn's exact field order and NUL separators),
    // the per-advisory latest pick (rev desc, content id asc), the
    // alias-component recursive CC with vuln_key/primary, the
    // weight-5 risk trio, and the unfurl counts against the versions
    // dimension. A regression in any stage OR in the glue between
    // stages breaks this row's hash.
    q("a15_advisory_ledger",
      s"""WITH RECURSIVE
         |log AS (SELECT o_orderkey % 500 AS k, o_orderkey % 7 AS rev
         |        FROM orders),
         |cidt AS (SELECT k, rev, sha256(
         |    'summary ' || CAST(k AS VARCHAR) || ' r' ||
         |      CAST(rev AS VARCHAR) || chr(0) ||
         |    least('AL-' || CAST(k % 250 AS VARCHAR),
         |          'BL-' || CAST(k // 2 AS VARCHAR)) || '|' ||
         |    greatest('AL-' || CAST(k % 250 AS VARCHAR),
         |             'BL-' || CAST(k // 2 AS VARCHAR)) || chr(0) ||
         |    CASE WHEN k % 13 = 0 THEN 'https://exploit.example/x'
         |         ELSE '' END || chr(0) ||
         |    'generic:' || CAST(k % 10 AS VARCHAR) || chr(0) ||
         |    'pkg:npm/p' || CAST(k % 20 AS VARCHAR) ||
         |      '#vers:generic/>=' || CAST(k % 3 + 1 AS VARCHAR) ||
         |      '|<=' || CAST(k % 3 + 4 AS VARCHAR) ||
         |      '#vers:generic/=' || CAST(k % 3 + 5 AS VARCHAR)) AS cid
         |  FROM log),
         |latest AS (SELECT k, cid FROM (
         |    SELECT k, cid, row_number() OVER (PARTITION BY k
         |             ORDER BY rev DESC, cid) AS rn
         |    FROM cidt) WHERE rn = 1),
         |$ccSql,
         |dim AS (SELECT DISTINCT
         |          'pkg:npm/p' || CAST(p_partkey % 20 AS VARCHAR) AS purl,
         |          p_partkey % 8 + 1 AS v
         |        FROM part),
         |cnt AS (SELECT o.k,
         |        (SELECT count(*) FROM dim d
         |         WHERE d.purl = 'pkg:npm/p' || CAST(o.k % 20 AS VARCHAR)
         |           AND d.v BETWEEN o.k % 3 + 1 AND o.k % 3 + 4) AS vul,
         |        (SELECT count(*) FROM dim d
         |         WHERE d.purl = 'pkg:npm/p' || CAST(o.k % 20 AS VARCHAR)
         |           AND d.v = o.k % 3 + 5) AS fix
         |        FROM o),
         |lrisk AS (SELECT k,
         |         round(CAST(k % 10 AS DOUBLE) * 5 / 10, 1) AS ws,
         |         CAST(CASE WHEN k % 13 = 0 THEN 1.0 ELSE 0.5 END
         |              AS DOUBLE) AS ex
         |        FROM o)
         |SELECT 'src/ADV-' || CAST(o.k AS VARCHAR) AS avid,
         |       substr(l.cid, 1, 8) AS content_prefix,
         |       v.vuln_key AS group_key,
         |       'src/ADV-' || CAST(p.pk AS VARCHAR) AS primary_avid,
         |       r.ws AS weighted_severity,
         |       r.ex AS exploitability,
         |       CASE WHEN r.ws > 0 AND r.ex > 0
         |            THEN round(least(r.ws * r.ex, 10), 1)
         |       END AS risk_score,
         |       CAST(c2.vul AS BIGINT) AS vulnerable_package_count,
         |       CAST(c2.fix AS BIGINT) AS patched_package_count
         |FROM o
         |JOIN latest l USING (k)
         |JOIN comp c ON c.k = o.k
         |JOIN vkey v ON v.comp = c.comp
         |JOIN prim p ON p.comp = c.comp
         |JOIN cnt c2 ON c2.k = o.k
         |JOIN lrisk r ON r.k = o.k
         |ORDER BY avid""") { (s, dir) =>
      val refType = "array<struct<reference_id:string," +
        "reference_type:string,url:string>>"
      val k = pmod(col("o_orderkey"), lit(500))
      val rev = pmod(col("o_orderkey"), lit(7))
      val raw = Tables(s, dir, "orders").select(
        lit("src").as("datasource_id"),
        concat(lit("ADV-"), k).as("advisory_id"),
        concat(lit("summary "), k, lit(" r"), rev).as("summary"),
        array(concat(lit("AL-"), pmod(k, lit(250))),
          concat(lit("BL-"), expr("(o_orderkey % 500) div 2")))
          .as("aliases"),
        when(pmod(k, lit(13)) === 0, array(struct(
          lit("r1").as("reference_id"),
          lit("exploit").as("reference_type"),
          lit("https://exploit.example/x").as("url"))))
          .otherwise(array().cast(refType)).as("references"),
        array(struct(lit("generic").as("scoring_system"),
          pmod(k, lit(10)).cast("string").as("value"),
          lit("").as("scoring_elements"),
          lit("https://sev.example/s").as("url"))).as("severities"),
        array(struct(
          concat(lit("pkg:npm/p"), pmod(k, lit(20))).as("purl"),
          concat(lit("vers:generic/>="), pmod(k, lit(3)) + 1,
            lit("|<="), pmod(k, lit(3)) + 4).as("affecting_vers"),
          concat(lit("vers:generic/="), pmod(k, lit(3)) + 5)
            .as("fixed_vers"))).as("affected"),
        to_timestamp(concat(lit("2024-01-0"), rev + 1))
          .as("date_collected"),
        pmod(k, lit(7)).as("precedence"))
      val dim = Tables(s, dir, "part").select(
        concat(lit("pkg:npm/p"), pmod(col("p_partkey"), lit(20)))
          .as("base_purl"),
        (pmod(col("p_partkey"), lit(8)) + 1).cast("string").as("version"))
        .distinct()
      graft.Engine.advisoryLedger(s, raw, dim).orderBy("avid")
    },

    q("d4_advisory_sets",
      s"""WITH RECURSIVE
         |$ccSql
         |SELECT 'adv/' || CAST(c.k AS VARCHAR) AS avid,
         |       v.vuln_key AS group_key,
         |       'adv/' || CAST(p.pk AS VARCHAR) AS primary_avid
         |FROM comp c
         |JOIN vkey v USING (comp)
         |JOIN prim p USING (comp)
         |ORDER BY avid""") { (s, dir) =>
      member(s, dir)
        .select(col("avid"), col("vuln_key").as("group_key"),
          col("primary_avid"))
        .orderBy("avid")
    },
  )
}
