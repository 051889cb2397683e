package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import graft.derive.AdvisoryDerive
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.9 — dedup / grouping / correlation operators (D1–D12).
  *
  * Reference: remove_duplicate_advisories.py:27-111 (D1),
  * pipes/group_advisories.py:182-285 (D2 union-find, D3 bucketing,
  * D4 set materialization, D12 precedence primary),
  * compute_advisory_todo.py:36-307 (D6 todos, D7 conflicts),
  * flag_ghost_packages.py:35-90 (D8), populate_vulnerability_summary
  * (D9), collect_commits.py:26-110 (D10), models.py:1217-1249 (D11).
  */
object DedupGroupQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // D1 — content-id dedup, keep oldest row per content hash. Survivor
    // selection is a groupBy-min, NOT a window row_number: min() partial-
    // aggregates map-side (combiner before the shuffle), where the window
    // would shuffle every row and sort each hash partition — the
    // difference between bytes-shuffled ∝ distinct hashes and ∝ corpus
    // at 100 TB. (The oracle SQL keeps the reference's row_number
    // formulation; the result set is identical.)
    q("d1_content_dedup",
      """SELECT doc_id, content_id FROM (
        |  SELECT doc_id, sha256(lower(trim(text))) AS content_id,
        |         row_number() OVER (PARTITION BY sha256(lower(trim(text)))
        |                            ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(sha2(lower(trim(col("text"))), 256).as("content_id"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id", "content_id")
        .orderBy("doc_id")
    },

    // D2 — connected components over the bipartite order/part graph
    // (advisories-sharing-aliases shape). Label propagation in Spark;
    // the oracle re-derives components with a bounded min-label fixpoint
    // (recursive CTE, UNION ALL + iteration counter): after k rounds a
    // node's accumulated min label is the smallest node id within k hops,
    // so 100 rounds >> the bipartite graph's diameter makes the per-node
    // min over all rounds exactly the component min. Verified identical
    // to the full transitive closure at sf0.01 (and ~18× cheaper).
    // ConnectedComponentsSpec truth tables additionally pin the Spark
    // algorithm's internals.
    q("d2_connected_components",
      """WITH RECURSIVE
        |edges AS (
        |  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |sym AS (
        |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |lbl(node, comp, i) AS (
        |  SELECT src AS node, src AS comp, 0 AS i
        |  FROM (SELECT DISTINCT src FROM sym)
        |  UNION ALL
        |  SELECT s.src AS node, min(l.comp) AS comp, l.i + 1 AS i
        |  FROM lbl l JOIN sym s ON l.node = s.dst
        |  WHERE l.i < 100
        |  GROUP BY s.src, l.i),
        |comp AS (SELECT node, min(comp) AS component FROM lbl GROUP BY node)
        |SELECT component, CAST(count(*) AS BIGINT) AS size,
        |       min(node) AS min_node
        |FROM comp GROUP BY component ORDER BY component""") { (s, dir) =>
      val edges = t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(10)) === 0)
        .select((col("l_orderkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      ConnectedComponents.labelPropagation(s, edges)
        .groupBy("component")
        .agg(count(lit(1)).as("size"), min("node").as("min_node"))
        .orderBy("component")
    },

    // D3 — content-hash pre-bucketing before identity merge
    q("d3_hash_buckets",
      """SELECT CAST(strpos('0123456789abcdef',
        |            substr(sha256(lower(trim(text))), 1, 1)) - 1 AS BIGINT)
        |         AS bucket,
        |       count(*) AS n_docs,
        |       count(DISTINCT sha256(lower(trim(text)))) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY bucket""") { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("content_id", sha2(lower(trim(col("text"))), 256))
        .withColumn("bucket",
          (instr(lit("0123456789abcdef"), substring(col("content_id"), 1, 1))
            - 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("content_id").as("n_distinct"))
        .orderBy("bucket")
    },

    // D6 — data-quality ToDo classification (when-chain)
    q("d6_todo_flags",
      """SELECT doc_id,
        |       CASE WHEN length(trim(text)) < 40 THEN 'missing_summary'
        |            WHEN n_chars < 150 THEN 'missing_packages'
        |            WHEN lang IS NULL OR lang = '' THEN 'missing_lang'
        |            ELSE 'ok' END AS todo
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(length(trim(col("text"))) < 40, "missing_summary")
            .when(col("n_chars") < 150, "missing_packages")
            .when(col("lang").isNull || col("lang") === "", "missing_lang")
            .otherwise("ok").as("todo"))
        .orderBy("doc_id")
    },

    // D7 — conflict detection: per p_type, do brands disagree on the
    // (sorted) set of sizes they ship? (>1 distinct profile ⇒ conflict)
    q("d7_conflict_sets",
      """SELECT p_type, count(DISTINCT profile) AS n_profiles FROM (
        |  SELECT p_type, p_brand,
        |         string_agg(DISTINCT printf('%03d', p_size), ','
        |                    ORDER BY printf('%03d', p_size)) AS profile
        |  FROM part GROUP BY p_type, p_brand)
        |GROUP BY p_type HAVING count(DISTINCT profile) > 1
        |ORDER BY p_type""") { (s, dir) =>
      t(s, dir, "part")
        .groupBy("p_type", "p_brand")
        .agg(array_join(array_sort(collect_set(format_string("%03d",
          col("p_size")))), ",").as("profile"))
        .groupBy("p_type")
        .agg(countDistinct("profile").as("n_profiles"))
        .filter(col("n_profiles") > 1)
        .orderBy("p_type")
    },

    // D8 — ghost flagging: version not present in the known-versions dim
    // (left-anti on the composite key)
    q("d8_ghost_flag",
      """SELECT p.p_partkey FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM (SELECT DISTINCT p_type, p_size FROM part
        |                 WHERE p_size % 3 <> 0) k
        |  WHERE k.p_type = p.p_type AND k.p_size = p.p_size)
        |ORDER BY p.p_partkey""") { (s, dir) =>
      val known = t(s, dir, "part")
        .filter(pmod(col("p_size"), lit(3)) =!= 0)
        .select(col("p_type").as("k_type"), col("p_size").as("k_size"))
        .distinct()
      t(s, dir, "part")
        .join(broadcast(known),
          col("p_type") === col("k_type") && col("p_size") === col("k_size"),
          "left_anti")
        .select("p_partkey")
        .orderBy("p_partkey")
    },

    // D9 — summary back-fill from the best record per group
    // (max n_chars, tie → lowest doc_id)
    q("d9_backfill",
      """SELECT d.doc_id, b.doc_id AS best_doc_id FROM documents d
        |JOIN (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id) AS rn FROM documents) b
        |  ON b.lang = d.lang AND b.rn = 1
        |ORDER BY d.doc_id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      val w = Window.partitionBy("lang").orderBy(col("n_chars").desc,
        col("doc_id"))
      val best = docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang").as("b_lang"), col("doc_id").as("best_doc_id"))
      docs.join(broadcast(best), col("lang") === col("b_lang"))
        .select("doc_id", "best_doc_id")
        .orderBy("doc_id")
    },

    // D10 — fix-commit harvesting from reference URLs
    q("d10_commit_harvest",
      """SELECT doc_id,
        |       regexp_extract(url, '(.*)/commit/[0-9a-f]+', 1) AS vcs_url,
        |       regexp_extract(url, '/commit/([0-9a-f]+)', 1) AS commit_hash
        |FROM (SELECT doc_id,
        |             CASE WHEN doc_id % 3 = 0
        |               THEN 'https://github.com/org/' || source || '/commit/'
        |                    || md5(text)
        |               ELSE 'https://example.com/advisory/' || doc_id
        |             END AS url
        |      FROM documents)
        |WHERE url LIKE '%/commit/%' ORDER BY doc_id""") { (s, dir) =>
      val withUrl = t(s, dir, "documents").withColumn("url",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("https://github.com/org/"), col("source"),
            lit("/commit/"), md5(col("text"))))
          .otherwise(concat(lit("https://example.com/advisory/"),
            col("doc_id"))))
      withUrl.filter(col("url").contains("/commit/"))
        .select(col("doc_id"),
          regexp_extract(col("url"), "(.*)/commit/[0-9a-f]+", 1).as("vcs_url"),
          regexp_extract(col("url"), "/commit/([0-9a-f]+)", 1)
            .as("commit_hash"))
        .orderBy("doc_id")
    },

    // D11 — confidence-max upsert: keep the highest-confidence relation row
    q("d11_confidence_max",
      """SELECT o_custkey, o_orderkey AS kept_order,
        |       round(o_totalprice, 2) AS confidence FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |            ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"),
          struct(col("o_totalprice"), (-col("o_orderkey")).as("tb")))
          .as("kept_order"),
          round(max("o_totalprice"), 2).as("confidence"))
        .orderBy("o_custkey")
    },

    // D12 — precedence-based primary selection within a group
    q("d12_precedence_primary",
      """SELECT p_type, p_partkey AS primary_part FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_type
        |            ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part)
        |WHERE rn = 1 ORDER BY p_type""") { (s, dir) =>
      t(s, dir, "part")
        .groupBy("p_type")
        .agg(max_by(col("p_partkey"),
          struct(col("p_retailprice"), (-col("p_partkey")).as("tb")))
          .as("primary_part"))
        .orderBy("p_type")
    },

    // D14 — CVE→CVSS3.1 mapping pipeline (add_cvss31_to_CVEs.py:25-102):
    // cvssv3-carrying advisories whose severity URL names a CVE receive
    // the NVD donor's cvssv3.1 value through an alias join. Synthetic
    // advisories from `orders`: every 3rd is the NVD donor, every
    // non-donor 4th carries a cvssv3 severity with an NVD detail URL.
    // CVE numbers are lpad-7 (the regex's MAX width — lpad at the
    // minimum width 4 TRUNCATES 5-7 digit residues in both engines,
    // collapsing ~1e7 distinct keys to ~1e4 and re-creating the
    // quadratic alias-join fan-out the residue exists to avoid) so the
    // reference's CVE-\d{4}-\d{4,7} extraction regex matches every row.
    q("d14_cvss31_map",
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         'CVE-2020-' || lpad(CAST((CAST(o_custkey AS BIGINT)
        |                                   * 1000003) % 9999991
        |                                  AS VARCHAR), 7, '0') AS cve
        |  FROM orders),
        |car AS (SELECT DISTINCT 'adv/' || CAST(k AS VARCHAR) AS avid,
        |               cve AS cve_id
        |        FROM o WHERE k % 3 <> 0 AND k % 4 = 0),
        |don AS (SELECT cve AS alias,
        |               CAST(k % 10 AS VARCHAR) AS value,
        |               'CVSS:3.1/E' || CAST(k % 5 AS VARCHAR)
        |                 AS scoring_elements
        |        FROM o WHERE k % 3 = 0)
        |SELECT DISTINCT car.avid, car.cve_id,
        |       'cvssv3.1' AS scoring_system,
        |       'https://nvd.nist.gov/vuln/detail/' || car.cve_id AS url,
        |       don.value, don.scoring_elements
        |FROM car JOIN don ON car.cve_id = don.alias
        |ORDER BY avid, value, scoring_elements""") { (s, dir) =>
      // CVE number = a 7-digit-bounded residue of custkey: the reference
      // extraction regex is CVE-\d{4}-\d{4,7}, and an 8+-digit number
      // TRUNCATES to 7 digits — at the 10x scale rehearsal the strided
      // custkeys overflowed that and the truncated collisions blew the
      // alias join up quadratically. The prime-multiplicative residue
      // keeps spread (collisions ~birthday at 1e7) and is computed
      // identically by both engines. lpad width MUST be the 7-digit
      // maximum: lpad truncates beyond its width in Spark and DuckDB
      // alike, so lpad-4 would collapse the residue spread right back.
      val cve = concat(lit("CVE-2020-"),
        lpad(pmod(col("o_custkey") * lit(1000003L), lit(9999991L))
          .cast("string"), 7, "0"))
      val donor = pmod(col("o_orderkey"), lit(3)) === 0
      val carrier = !donor && pmod(col("o_orderkey"), lit(4)) === 0
      val sev = (sys: String, value: Column, elems: Column, url: Column) =>
        struct(lit(sys).as("scoring_system"), value.as("value"),
          elems.as("scoring_elements"), url.as("url"))
      val adv = t(s, dir, "orders").select(
        concat(lit("adv/"), col("o_orderkey")).as("avid"),
        when(donor, "nvd").otherwise("osv").as("datasource_id"),
        lit(true).as("is_latest"),
        array(cve).as("aliases"),
        when(donor, array(sev("cvssv3.1",
          pmod(col("o_orderkey"), lit(10)).cast("string"),
          concat(lit("CVSS:3.1/E"), pmod(col("o_orderkey"), lit(5))),
          lit(""))))
          .when(carrier, array(sev("cvssv3", lit("5.0"), lit(""),
            concat(lit("https://nvd.nist.gov/vuln/detail/"), cve))))
          .otherwise(array().cast(
            "array<struct<scoring_system:string,value:string," +
              "scoring_elements:string,url:string>>")).as("severities"))
      graft.derive.AdvisoryDerive.cveCvss31Severities(adv)
        .orderBy("avid", "value", "scoring_elements")
    },

    // D15 — reference-archival state machine (archive_urls.py:28-60):
    // fold one fetch round into the references table. Pending rows (null
    // archive state, http url) that were attempted get the archive URL
    // or the NO_ARCHIVE sentinel; non-http, already-archived, and
    // already-sentineled rows keep their state.
    q("d15_archive_fold",
      """WITH refs AS (
        |  SELECT p_partkey AS ref_id,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |         WHEN p_partkey % 5 = 1
        |           THEN 'ftp://files.example/' || CAST(p_partkey AS VARCHAR)
        |         ELSE 'https://ref.example/' ||
        |              CAST(p_partkey % 200 AS VARCHAR) END AS url,
        |    CASE WHEN p_partkey % 7 = 0 THEN 'NO_ARCHIVE'
        |         WHEN p_partkey % 7 = 1 THEN 'https://web.archive.org/old/'
        |              || CAST(p_partkey AS VARCHAR)
        |         ELSE NULL END AS archive_url
        |  FROM part),
        |f AS (
        |  SELECT DISTINCT
        |    'https://ref.example/' || CAST(p_partkey % 200 AS VARCHAR)
        |      AS url,
        |    CASE WHEN (p_partkey % 200) % 3 = 0 THEN NULL
        |         ELSE 'https://web.archive.org/web/' ||
        |              CAST(p_partkey % 200 AS VARCHAR) END AS af
        |  FROM part WHERE p_partkey % 200 < 120)
        |SELECT r.ref_id, r.url,
        |  CASE WHEN r.archive_url IS NULL AND r.url IS NOT NULL
        |            AND r.url LIKE 'http%' AND f.url IS NOT NULL
        |       THEN coalesce(f.af, 'NO_ARCHIVE')
        |       ELSE r.archive_url END AS archive_url
        |FROM refs r LEFT JOIN f ON r.url = f.url
        |ORDER BY ref_id""") { (s, dir) =>
      val refs = t(s, dir, "part").select(
        col("p_partkey").as("ref_id"),
        when(pmod(col("p_partkey"), lit(5)) === 0, lit(null))
          .when(pmod(col("p_partkey"), lit(5)) === 1,
            concat(lit("ftp://files.example/"), col("p_partkey")))
          .otherwise(concat(lit("https://ref.example/"),
            pmod(col("p_partkey"), lit(200)))).as("url"),
        when(pmod(col("p_partkey"), lit(7)) === 0,
          lit(graft.derive.ReferenceArchive.NoArchive))
          .when(pmod(col("p_partkey"), lit(7)) === 1,
            concat(lit("https://web.archive.org/old/"), col("p_partkey")))
          .otherwise(lit(null)).as("archive_url"))
      val fetched = t(s, dir, "part")
        .select(pmod(col("p_partkey"), lit(200)).as("n")).distinct()
        .filter(col("n") < 120)
        .select(concat(lit("https://ref.example/"), col("n")).as("url"),
          when(pmod(col("n"), lit(3)) === 0, lit(null))
            .otherwise(concat(lit("https://web.archive.org/web/"),
              col("n"))).as("archive_url"))
      graft.derive.ReferenceArchive.applyArchiveResults(refs, fetched)
        .orderBy("ref_id")
    },

    // D16 — DefaultImprover inference expansion (improvers/default.py:
    // 52-141 get_inferences + get_exact_purls): per impact, affected =
    // in-range constraint endpoints, one inference per fixed pin
    // (`!=` exclusions + the explicit fixed_version), package-less
    // advisories emit one empty inference. The oracle re-derives the
    // endpoint algebra from the same arithmetic columns.
    q("d16_default_inferences",
      """WITH adv AS (SELECT DISTINCT
        |         'adv/' || CAST(o_orderkey % 50 AS VARCHAR) AS avid
        |       FROM orders),
        |imp AS (SELECT
        |         'adv/' || CAST(o_orderkey % 40 AS VARCHAR) AS avid,
        |         'p' || CAST(o_custkey % 20 AS VARCHAR) AS name,
        |         o_orderkey % 4 + 1 AS lo, o_orderkey % 4 + 3 AS hi,
        |         CASE WHEN o_orderkey % 3 = 0
        |              THEN CAST(o_orderkey % 4 + 4 AS VARCHAR) END AS fixv
        |       FROM orders),
        |expl AS (
        |  SELECT avid, name,
        |         CAST(lo AS VARCHAR) || ',' || CAST(hi AS VARCHAR)
        |           AS affected, '9' AS fixed
        |  FROM imp
        |  UNION ALL
        |  SELECT avid, name,
        |         CAST(lo AS VARCHAR) || ',' || CAST(hi AS VARCHAR),
        |         fixv
        |  FROM imp WHERE fixv IS NOT NULL
        |  UNION ALL
        |  SELECT a.avid, NULL, '', NULL
        |  FROM adv a WHERE a.avid NOT IN (SELECT avid FROM imp))
        |SELECT avid, name, affected, fixed, 100 AS confidence
        |FROM expl
        |ORDER BY avid, name, affected, fixed""") { (s, dir) =>
      val advisories = t(s, dir, "orders")
        .select(concat(lit("adv/"), pmod(col("o_orderkey"), lit(50)))
          .as("avid")).distinct()
      val lo = pmod(col("o_orderkey"), lit(4)) + 1
      val impacts = t(s, dir, "orders").select(
        concat(lit("adv/"), pmod(col("o_orderkey"), lit(40))).as("avid"),
        lit("npm").as("ptype"), lit("").as("namespace"),
        concat(lit("p"), pmod(col("o_custkey"), lit(20))).as("name"),
        lit("").as("qualifiers"),
        concat(lit("vers:generic/>="), lo, lit("|<="), lo + 2,
          lit("|!=9")).as("affecting_vers"),
        when(pmod(col("o_orderkey"), lit(3)) === 0,
          (lo + 3).cast("string")).as("fixed_version"))
      graft.derive.Improvers.defaultInferences(advisories, impacts)
        .select(col("avid"), col("name"),
          concat_ws(",", col("affected_versions")).as("affected"),
          col("fixed_version").as("fixed"), col("confidence"))
        .orderBy("avid", "name", "affected", "fixed")
    },

    // D17 — ValidVersionImprover expansion (improvers/valid_versions.py:
    // 85-214 + utils.resolve_version_range/nearest_patched_package):
    // ranges expand against the known-versions dimension, every affected
    // version takes its nearest strictly-greater unaffected version as
    // the fix, groups collect per fix; range-less pins keep qualifiers
    // only on the merged (single-purl) branch, and pins are suppressed
    // when a merged advisory also carries ranges. The oracle re-derives
    // the merge decision from the data and the nearest fix with a
    // correlated min — the window-free formulation.
    q("d17_valid_version_inferences",
      """WITH imp AS (SELECT o_orderkey AS iid,
        |         'adv/' || CAST(o_orderkey % 30 AS VARCHAR) AS avid,
        |         'q' || CAST(CASE WHEN (o_orderkey % 30) % 2 = 0
        |                          THEN (o_orderkey % 30) % 10
        |                          ELSE o_custkey % 10 END AS VARCHAR)
        |           AS name,
        |         CASE WHEN (o_orderkey % 30) % 2 = 0 THEN 'distro=a'
        |              ELSE 'distro=d' || CAST(o_custkey % 2 AS VARCHAR)
        |              END AS quals,
        |         CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |              ELSE 'r' END AS hasrange,
        |         o_orderkey % 3 + 1 AS lo, o_orderkey % 3 + 4 AS hi,
        |         CASE WHEN o_orderkey % 4 IN (0, 1)
        |              THEN CAST(o_orderkey % 3 + 5 AS VARCHAR) END AS fixv
        |       FROM orders),
        |adv AS (SELECT avid,
        |               count(DISTINCT name || '|' || quals) = 1 AS merged,
        |               max(CASE WHEN hasrange IS NOT NULL
        |                        THEN 1 ELSE 0 END) AS has_range
        |        FROM imp GROUP BY avid),
        |vv AS (SELECT DISTINCT
        |         'q' || CAST(p_partkey % 10 AS VARCHAR) AS name,
        |         CAST(p_partkey % 8 + 1 AS VARCHAR) AS v
        |       FROM part),
        |rangeless AS (
        |  SELECT i.avid, i.name,
        |         CASE WHEN a.merged THEN i.quals END AS quals,
        |         '' AS affected, i.fixv AS fixed
        |  FROM imp i JOIN adv a USING (avid)
        |  WHERE i.hasrange IS NULL AND i.fixv IS NOT NULL
        |    AND (NOT a.merged OR a.has_range = 0)),
        |joined AS (
        |  SELECT i.iid, i.avid, i.name, vv.v,
        |         CAST(vv.v AS INT) BETWEEN i.lo AND i.hi AS in_range
        |  FROM imp i JOIN vv ON vv.name = i.name
        |  WHERE i.hasrange IS NOT NULL),
        |assigned AS (
        |  SELECT iid, avid, name, v,
        |         (SELECT min(CAST(j2.v AS INT)) FROM joined j2
        |          WHERE j2.iid = j.iid AND NOT j2.in_range
        |            AND CAST(j2.v AS INT) > CAST(j.v AS INT)) AS fx
        |  FROM joined j WHERE j.in_range),
        |expanded AS (
        |  SELECT avid, name, CAST(NULL AS VARCHAR) AS quals,
        |         string_agg(v, ',' ORDER BY v) AS affected,
        |         CAST(fx AS VARCHAR) AS fixed
        |  FROM assigned GROUP BY iid, avid, name, fx)
        |SELECT avid, name, quals, affected, fixed, 100 AS confidence
        |FROM (SELECT * FROM rangeless
        |      UNION ALL SELECT * FROM expanded)
        |ORDER BY avid, name, quals, affected, fixed""") { (s, dir) =>
      val akey = pmod(col("o_orderkey"), lit(30))
      val lo = pmod(col("o_orderkey"), lit(3)) + 1
      val impacts = t(s, dir, "orders").select(
        concat(lit("adv/"), akey).as("avid"),
        lit("npm").as("ptype"), lit("").as("namespace"),
        concat(lit("q"), when(pmod(akey, lit(2)) === 0, pmod(akey, lit(10)))
          .otherwise(pmod(col("o_custkey"), lit(10)))).as("name"),
        when(pmod(akey, lit(2)) === 0, lit("distro=a"))
          .otherwise(concat(lit("distro=d"),
            pmod(col("o_custkey"), lit(2)))).as("qualifiers"),
        when(pmod(col("o_orderkey"), lit(4)) === 0, lit(null))
          .otherwise(concat(lit("vers:generic/>="), lo, lit("|<="),
            lo + 3)).as("affecting_vers"),
        when(pmod(col("o_orderkey"), lit(4)).isin(0, 1),
          (lo + 4).cast("string")).as("fixed_version"))
      val versions = t(s, dir, "part").select(
        lit("npm").as("ptype"), lit("").as("namespace"),
        concat(lit("q"), pmod(col("p_partkey"), lit(10))).as("name"),
        (pmod(col("p_partkey"), lit(8)) + 1).cast("string").as("version"))
        .distinct()
      graft.derive.Improvers.validVersionInferences(impacts, versions)
        .select(col("avid"), col("name"), col("qualifiers").as("quals"),
          concat_ws(",", col("affected_versions")).as("affected"),
          col("fixed_version").as("fixed"), col("confidence"))
        .orderBy("avid", "name", "quals", "affected", "fixed")
    },

    // D17b — the d17 improver over `vers:openssl/` ranges (round-14
    // scheme addition): legacy letter-patch boundaries (>=1.1.1|<1.1.1b
    // .. d) and the era split (<3.0.0 catches the 3.0.0 prereleases —
    // univers OpensslVersion, where the generic fallback ordered
    // 3.0.0-alpha1 ABOVE 3.0.0). The oracle ranks the constructed
    // version set explicitly (a VALUES table), so the DuckDB side is an
    // independent spelling of the openssl order, not a key mirror.
    q("d17b_openssl_letters",
      """WITH v(r, vname) AS (VALUES
        |    (0, '1.1.1'), (1, '1.1.1a'), (2, '1.1.1b'), (3, '1.1.1c'),
        |    (4, '1.1.1d'), (5, '1.1.1e'), (6, '1.1.1f'), (7, '1.1.1g'),
        |    (8, '3.0.0-alpha1'), (9, '3.0.0')),
        |imp AS (SELECT DISTINCT o_orderkey % 2000 AS iid,
        |         'ossl/' || CAST((o_orderkey % 2000) % 50 AS VARCHAR)
        |           AS avid,
        |         CASE (o_orderkey % 2000) % 4 WHEN 3 THEN 9
        |              ELSE (o_orderkey % 2000) % 4 + 2 END AS hi
        |       FROM orders),
        |vv AS (SELECT DISTINCT p_partkey % 10 AS r FROM part),
        |joined AS (SELECT i.iid, i.avid, vv.r, vv.r < i.hi AS in_range
        |           FROM imp i, vv),
        |assigned AS (
        |  SELECT iid, avid, r,
        |         (SELECT min(j2.r) FROM joined j2
        |          WHERE j2.iid = j.iid AND NOT j2.in_range
        |            AND j2.r > j.r) AS fx
        |  FROM joined j WHERE j.in_range),
        |expanded AS (
        |  SELECT a.avid,
        |         string_agg(v.vname, ',' ORDER BY a.r) AS affected,
        |         max(f.vname) AS fixed
        |  FROM assigned a JOIN v ON v.r = a.r
        |       LEFT JOIN v f ON f.r = a.fx
        |  GROUP BY a.iid, a.avid, a.fx)
        |SELECT avid, 'openssl' AS name, affected, fixed, 100 AS confidence
        |FROM expanded
        |ORDER BY avid, affected, fixed""") { (s, dir) =>
      val letters = Seq("1.1.1") ++ "abcdefg".map(c => s"1.1.1$c") ++
        Seq("3.0.0-alpha1", "3.0.0")
      val hiLetter = array(lit("1.1.1b"), lit("1.1.1c"), lit("1.1.1d"))
      // distinct impact keys: with one package name the join fan-out is
      // |impacts| × |versions|, and raw orders rows as impacts made the
      // bench row measure harness row-count, not the improver
      val iid = pmod(col("o_orderkey"), lit(2000))
      val impacts = t(s, dir, "orders").select(iid.as("_iid")).distinct()
        .select(
          concat(lit("ossl/"), pmod(col("_iid"), lit(50))).as("avid"),
          lit("openssl").as("ptype"), lit("").as("namespace"),
          lit("openssl").as("name"), lit("").as("qualifiers"),
          concat(lit("vers:openssl/>=1.1.1|<"),
            when(pmod(col("_iid"), lit(4)) === 3, lit("3.0.0"))
              .otherwise(element_at(hiLetter,
                (pmod(col("_iid"), lit(4)) + 1).cast("int"))))
            .as("affecting_vers"),
          lit(null).cast("string").as("fixed_version"))
      val versions = t(s, dir, "part").select(
        lit("openssl").as("ptype"), lit("").as("namespace"),
        lit("openssl").as("name"),
        element_at(array(letters.map(lit): _*),
          (pmod(col("p_partkey"), lit(10)) + 1).cast("int")).as("version"))
        .distinct()
      graft.derive.Improvers.validVersionInferences(impacts, versions)
        .select(col("avid"), col("name"),
          concat_ws(",", col("affected_versions")).as("affected"),
          col("fixed_version").as("fixed"), col("confidence"))
        .orderBy("avid", "affected", "fixed")
    },

    // D17c — the d17 improver over `vers:apache/` ranges (round-15
    // scheme addition): univers ApacheVersion is semantic_version
    // coerce, so a 4th dotted segment is build metadata that sort-TIES
    // its base (0.10.2.2 == 0.10.2 for <,<=) while `=`/`!=` include it
    // — both boundaries the generic fallback got wrong. The oracle
    // ranks the constructed version set explicitly (a VALUES table
    // where tied versions SHARE a rank), so the DuckDB side is an
    // independent spelling of the apache order: pure variants take the
    // bound fast path, the `!=`-exclusion variant drives the general
    // window's bisect_right tie discipline (a tied unaffected version
    // is never the fix).
    q("d17c_apache_buildmeta",
      """WITH v(r, vname) AS (VALUES
        |    (0,'2.4.1'),(1,'2.4.2'),(1,'2.4.2.2'),(2,'2.4.3'),
        |    (2,'2.4.3.1'),(3,'2.4.4'),(4,'10.0.0-M4'),(5,'10.0.0'),
        |    (5,'10.0.0.1'),(6,'10.1')),
        |imp AS (SELECT DISTINCT o_orderkey % 2000 AS iid,
        |         'apch/' || CAST((o_orderkey % 2000) % 50 AS VARCHAR)
        |           AS avid,
        |         (o_orderkey % 2000) % 5 AS var
        |       FROM orders),
        |joined AS (SELECT i.iid, i.avid, i.var, v.r, v.vname,
        |    CASE i.var
        |      WHEN 0 THEN v.r <= 1
        |      WHEN 1 THEN v.r BETWEEN 1 AND 2
        |      WHEN 2 THEN v.r BETWEEN 2 AND 4
        |      WHEN 3 THEN v.r BETWEEN 0 AND 2 AND v.vname <> '2.4.2.2'
        |      ELSE v.r = 5 END AS in_range,
        |    CASE i.var WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 4 THEN 5
        |      ELSE 0 END AS lo_r
        |  FROM imp i, v),
        |purefix AS (
        |  SELECT j.iid, j.vname AS fixed,
        |         row_number() OVER (PARTITION BY j.iid
        |           ORDER BY j.r, j.vname) AS rn
        |  FROM joined j
        |  WHERE j.var <> 3 AND NOT j.in_range AND j.r >= j.lo_r),
        |pure AS (
        |  SELECT p.iid, p.avid,
        |         string_agg(p.vname, ',' ORDER BY p.r, p.vname) AS affected,
        |         f.fixed
        |  FROM joined p LEFT JOIN (SELECT iid, fixed FROM purefix
        |                           WHERE rn = 1) f ON f.iid = p.iid
        |  WHERE p.var <> 3 AND p.in_range
        |  GROUP BY p.iid, p.avid, f.fixed),
        |genfix AS (
        |  SELECT a.iid, a.avid, a.r, a.vname,
        |    (SELECT u.vname FROM joined u
        |      WHERE u.iid = a.iid AND NOT u.in_range AND u.r > a.r
        |      ORDER BY u.r, u.vname LIMIT 1) AS fixed
        |  FROM joined a WHERE a.var = 3 AND a.in_range),
        |gen AS (
        |  SELECT iid, avid,
        |         string_agg(vname, ',' ORDER BY r, vname) AS affected,
        |         fixed
        |  FROM genfix GROUP BY iid, avid, fixed)
        |SELECT avid, 'httpd' AS name, affected, fixed, 100 AS confidence
        |FROM (SELECT avid, affected, fixed FROM pure
        |      UNION ALL SELECT avid, affected, fixed FROM gen)
        |ORDER BY avid, affected, fixed""") { (s, dir) =>
      val vnames = Seq("2.4.1", "2.4.2", "2.4.2.2", "2.4.3", "2.4.3.1",
        "2.4.4", "10.0.0-M4", "10.0.0", "10.0.0.1", "10.1")
      val ranges = array(
        lit("vers:apache/<=2.4.2"),
        lit("vers:apache/>=2.4.2|<2.4.4"),
        lit("vers:apache/>=2.4.3|<10.0.0"),
        lit("vers:apache/>=2.4.1|<2.4.4|!=2.4.2.2"),
        lit("vers:apache/>=10.0.0|<10.1"))
      val iid = pmod(col("o_orderkey"), lit(2000))
      val impacts = t(s, dir, "orders").select(iid.as("_iid")).distinct()
        .select(
          concat(lit("apch/"), pmod(col("_iid"), lit(50))).as("avid"),
          lit("apache").as("ptype"), lit("").as("namespace"),
          lit("httpd").as("name"), lit("").as("qualifiers"),
          element_at(ranges, (pmod(col("_iid"), lit(5)) + 1).cast("int"))
            .as("affecting_vers"),
          lit(null).cast("string").as("fixed_version"))
      val versions = t(s, dir, "part").select(
        lit("apache").as("ptype"), lit("").as("namespace"),
        lit("httpd").as("name"),
        element_at(array(vnames.map(lit): _*),
          (pmod(col("p_partkey"), lit(10)) + 1).cast("int")).as("version"))
        .distinct()
      graft.derive.Improvers.validVersionInferences(impacts, versions)
        .select(col("avid"), col("name"),
          concat_ws(",", col("affected_versions")).as("affected"),
          col("fixed_version").as("fixed"), col("confidence"))
        .orderBy("avid", "affected", "fixed")
    },

    // D18 — NVD status improver (improvers/vulnerability_status.py:
    // 78-103): MITRE CVE records → status enum; disputed-tag beats
    // REJECTED state beats PUBLISHED default, missing record →
    // PUBLISHED. Fixture tags arrays are ≤2 entries so the oracle's
    // per-position contains matches the engine's array_contains.
    q("d18_vuln_status",
      """WITH rec AS (SELECT
        |    'CVE-2020-' || CAST(o_orderkey AS VARCHAR) AS cve_id,
        |    CASE o_orderkey % 4
        |      WHEN 0 THEN '{"cveMetadata":{"state":"REJECTED"},' ||
        |        '"containers":{"cna":{"tags":["x","disputed"]}}}'
        |      WHEN 1 THEN '{"cveMetadata":{"state":"REJECTED"},' ||
        |        '"containers":{"cna":{"tags":["x"]}}}'
        |      WHEN 2 THEN '{"cveMetadata":{"state":"PUBLISHED"},' ||
        |        '"containers":{"cna":{"tags":["x"]}}}'
        |    END AS body
        |  FROM orders)
        |SELECT cve_id,
        |  CASE WHEN json_extract_string(body,
        |              '$.containers.cna.tags[0]') = 'disputed'
        |         OR json_extract_string(body,
        |              '$.containers.cna.tags[1]') = 'disputed' THEN 2
        |       WHEN json_extract_string(body,
        |              '$.cveMetadata.state') = 'REJECTED' THEN 3
        |       ELSE 1 END AS status
        |FROM rec ORDER BY cve_id""") { (s, dir) =>
      val records = t(s, dir, "orders").select(
        concat(lit("CVE-2020-"), col("o_orderkey")).as("cve_id"),
        when(pmod(col("o_orderkey"), lit(4)) === 0,
          lit("""{"cveMetadata":{"state":"REJECTED"},""" +
            """"containers":{"cna":{"tags":["x","disputed"]}}}"""))
          .when(pmod(col("o_orderkey"), lit(4)) === 1,
            lit("""{"cveMetadata":{"state":"REJECTED"},""" +
              """"containers":{"cna":{"tags":["x"]}}}"""))
          .when(pmod(col("o_orderkey"), lit(4)) === 2,
            lit("""{"cveMetadata":{"state":"PUBLISHED"},""" +
              """"containers":{"cna":{"tags":["x"]}}}"""))
          .as("body"))
      graft.derive.Improvers.vulnerabilityStatuses(records)
        .orderBy("cve_id")
    },

    // D19 — nginx branch-aware improver (valid_versions.py:216-283 +
    // utils.py:482-509): affected = known versions in range with no
    // same-minor fix at-or-below them; one confidence-90 inference per
    // fixed version. Versions are `1.<minor>.<patch>` single-digits so
    // the oracle's numeric (minor, patch) compare equals the engine's
    // nginx sort key.
    q("d19_nginx_inferences",
      """WITH imp AS (SELECT
        |    'adv/' || CAST(o_orderkey % 20 AS VARCHAR) AS avid,
        |    o_orderkey % 3 AS lo, o_orderkey % 3 + 2 AS hi,
        |    CASE WHEN o_orderkey % 2 = 0
        |         THEN '1.' || CAST(o_orderkey % 6 AS VARCHAR) || '.' ||
        |              CAST(o_orderkey % 4 + 1 AS VARCHAR) END AS fixv
        |  FROM orders),
        |rng AS (SELECT DISTINCT avid, lo, hi FROM imp),
        |fx AS (SELECT DISTINCT avid, fixv,
        |         CAST(split_part(fixv, '.', 2) AS INT) AS fminor,
        |         CAST(split_part(fixv, '.', 3) AS INT) AS fpatch
        |       FROM imp WHERE fixv IS NOT NULL),
        |vv AS (SELECT DISTINCT CAST(p_partkey % 6 AS INT) AS vminor,
        |         CAST(p_partkey % 3 AS INT) AS vpatch FROM part),
        |aff AS (
        |  SELECT r.avid,
        |         '1.' || CAST(v.vminor AS VARCHAR) || '.' ||
        |           CAST(v.vpatch AS VARCHAR) AS ver
        |  FROM rng r JOIN vv v
        |    ON v.vminor >= r.lo AND v.vminor <= r.hi
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM fx f
        |    WHERE f.avid = r.avid AND f.fminor = v.vminor
        |      AND (v.vminor, v.vpatch) >= (f.fminor, f.fpatch))),
        |agg AS (SELECT avid, string_agg(ver, ',' ORDER BY ver)
        |          AS affected
        |        FROM aff GROUP BY avid)
        |SELECT f.avid, 'ng' AS name, coalesce(a.affected, '') AS affected,
        |       f.fixv AS fixed, 90 AS confidence
        |FROM fx f LEFT JOIN agg a USING (avid)
        |ORDER BY avid, fixed""") { (s, dir) =>
      val lo = pmod(col("o_orderkey"), lit(3))
      val impacts = t(s, dir, "orders").select(
        concat(lit("adv/"), pmod(col("o_orderkey"), lit(20))).as("avid"),
        lit("nginx").as("ptype"), lit("").as("namespace"),
        lit("ng").as("name"), lit("").as("qualifiers"),
        concat(lit("vers:nginx/>=1."), lo, lit(".0|<=1."), lo + 2,
          lit(".9")).as("affecting_vers"),
        when(pmod(col("o_orderkey"), lit(2)) === 0,
          concat(lit("1."), pmod(col("o_orderkey"), lit(6)), lit("."),
            pmod(col("o_orderkey"), lit(4)) + 1)).as("fixed_version"))
      val versions = t(s, dir, "part").select(
        lit("nginx").as("ptype"), lit("").as("namespace"),
        lit("ng").as("name"),
        concat(lit("1."), pmod(col("p_partkey"), lit(6)), lit("."),
          pmod(col("p_partkey"), lit(3))).as("version")).distinct()
      graft.derive.Improvers.nginxInferences(impacts, versions)
        .select(col("avid"), col("name"),
          concat_ws(",", col("affected_versions")).as("affected"),
          col("fixed_version").as("fixed"), col("confidence"))
        .orderBy("avid", "fixed")
    },

    // D20 — CodeFixV2 mart (v2_improvers/collect_commits.py:35-77):
    // VCS-scheme /commit/ reference URLs store VERBATIM
    // (normalize_vcs_url's scheme branch is identity), a commit claimed
    // once across advisories (min-avid first-wins, the queryset-order
    // analog), fanned to the advisory's affecting packages. The git://
    // and https:// spellings of one commit stay DISTINCT like the
    // reference — the oracle gates that too.
    q("d20_code_fixes",
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
        |  FROM lineitem WHERE l_quantity > 25)
        |SELECT f.vcs_url, f.avid, a.affected_package
        |FROM first f JOIN aff a USING (avid)
        |ORDER BY vcs_url, affected_package""") { (s, dir) =>
      val okey = col("o_orderkey")
      val commit = substring(md5(pmod(okey, lit(8)).cast("string")), 1, 8)
      val refs = t(s, dir, "orders").select(
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
      val unfurled = t(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"),
        (col("l_quantity") > 25).as("is_affected"))
      // flat link-fed path — the reference's own iteration shape
      // (collect_commits.py:51 walks the AdvisoryReference link table).
      // The previous harness wrapped refs into per-advisory arrays just
      // for codeFixes to explode them back; with avid = okey % 50 that
      // collect_list round-trip was 94% of the 100x cost
      // (FanoutStageProbe: nested 89.9 s vs link-fed 5.4 s, identical
      // 3,920 output rows) — a modulo-key harness artifact, not an
      // operator cost. codeFixes(nested) remains the entry point for
      // genuinely nested advisory rows (bounded arrays on real data)
      // and delegates to this same link-fed core.
      AdvisoryDerive.codeFixesFromLinks(refs, unfurled)
        .orderBy("vcs_url", "affected_package")
    },

    // D21 — CveIdImprover backfill (improvers/add_missing_refid.py:
    // 26-46, unregistered in the reference's active registry — see
    // Improvers.unregisteredReferenceImprovers): references with a
    // missing id and an NVD CVE detail url get the id regex-extracted;
    // non-NVD urls, already-set ids, and pattern misses stay untouched
    // (k%5=0 rows carry a too-short CVE number that contains the NVD
    // prefix but fails the \d{4,7} pattern).
    q("d21_cveid_backfill",
      """WITH r AS (
        |  SELECT o_orderkey AS ref_key,
        |         CASE WHEN o_orderkey % 3 = 0 THEN
        |                'https://nvd.nist.gov/vuln/detail/CVE-2021-' ||
        |                  CASE WHEN o_orderkey % 5 = 0 THEN
        |                    CAST(o_orderkey % 100 AS VARCHAR)
        |                  ELSE CAST(1000 + o_orderkey % 9000 AS VARCHAR)
        |                  END
        |              WHEN o_orderkey % 3 = 1 THEN
        |                'https://nvd.nist.gov/vuln/detail/CVE-2020-' ||
        |                  CAST(1000 + o_orderkey % 9000 AS VARCHAR)
        |              ELSE 'https://example.com/adv/' ||
        |                CAST(o_orderkey AS VARCHAR) END AS url,
        |         CASE WHEN o_orderkey % 3 = 1
        |              THEN 'R-' || CAST(o_orderkey AS VARCHAR) END
        |           AS reference_id
        |  FROM orders)
        |SELECT ref_key, url,
        |       CASE WHEN (reference_id IS NULL OR reference_id = '')
        |                 AND contains(url,
        |                   'nvd.nist.gov/vuln/detail/CVE-')
        |                 AND regexp_matches(url,
        |                   'CVE-[0-9]{4}-[0-9]{4,7}')
        |            THEN regexp_extract(url,
        |              '(CVE-[0-9]{4}-[0-9]{4,7})', 1)
        |            ELSE reference_id END AS reference_id
        |FROM r ORDER BY ref_key""") { (s, dir) =>
      val okey = col("o_orderkey")
      val refs = t(s, dir, "orders").select(
        okey.as("ref_key"),
        when(pmod(okey, lit(3)) === 0,
          concat(lit("https://nvd.nist.gov/vuln/detail/CVE-2021-"),
            when(pmod(okey, lit(5)) === 0,
              pmod(okey, lit(100)).cast("string"))
              .otherwise((lit(1000) + pmod(okey, lit(9000)))
                .cast("string"))))
          .when(pmod(okey, lit(3)) === 1,
            concat(lit("https://nvd.nist.gov/vuln/detail/CVE-2020-"),
              (lit(1000) + pmod(okey, lit(9000))).cast("string")))
          .otherwise(concat(lit("https://example.com/adv/"),
            okey.cast("string"))).as("url"),
        when(pmod(okey, lit(3)) === 1,
          concat(lit("R-"), okey.cast("string"))).as("reference_id"))
      graft.derive.Improvers.cveIdBackfill(refs)
        .select("ref_key", "url", "reference_id")
        .orderBy("ref_key")
    },
  )
}
