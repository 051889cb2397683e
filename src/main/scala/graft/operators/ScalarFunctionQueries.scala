package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — scalar functions (F1–F24), exercised over testdata with
  * independently-formulated DuckDB oracles.
  *
  * Reference: utils.py:594-600 (F1 purl), utils.py:410-422 (F2 plain purl),
  * utils.py:370-374 (F5 cleanup), utils.py:612-620 (F7 normalize_text),
  * utils.py:342-350 (F8 reference id), importer.py:147-154 (F9 classify),
  * models.py:1334-1348 (F10 alias URL), risk.py:42-46 (F11 domain),
  * severity_systems.py:48-131 (F12 CVSS), risk.py:30-38 (F14 textual map),
  * utils.py:639-643 (F15 hashes), utils.py:326-339 (F18 description),
  * utils.py:110-115 (F20 contains_alpha), pipelines/collect_commits.py
  * (F21 commit regex), pipes/risk_score.py:19-26 (F23 HALF_UP),
  * models.py:559-585 (F24 CWE dim join).
  */
object ScalarFunctionQueries extends QueryModule {

  // Absolute path of the bundled CWE catalog for the DuckDB oracle (the
  // Spark side loads the same file from the classpath); resolved like
  // IngestQueries.Fix because the driver's DuckDB runs from any cwd.
  private val CwePath: String = {
    val rel = java.nio.file.Paths
      .get("src/main/resources/graft/cwe_catalog.tsv")
    if (java.nio.file.Files.exists(rel))
      rel.toAbsolutePath.normalize.toString
    else "/root/repo/src/main/resources/graft/cwe_catalog.tsv"
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // F1/F2/F3 — purl build + normalize + plain (roundtrip through codec)
    q("f1_purl_codec",
      """SELECT p_partkey,
        |       'pkg:npm/' || replace(lower(p_name), ' ', '-') ||
        |         '@' || p_size || '.0.0' AS purl,
        |       'pkg:npm/' || replace(lower(p_name), ' ', '-') ||
        |         '@' || p_size || '.0.0' AS plain_purl
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      // input deliberately non-canonical (pkg:NPM, qualifier noise) — the
      // codec must normalize to the oracle's canonical form
      val raw = t(s, dir, "part").withColumn("raw_purl",
        concat(lit("pkg:NPM/"),
          regexp_replace(lower(col("p_name")), " ", "-"),
          lit("@"), col("p_size"), lit(".0.0?Empty=&ignored=")))
      raw.select(col("p_partkey"),
        GraftFunctions.purlNormalizeUdf(col("raw_purl")).as("purl"),
        GraftFunctions.purlPlainUdf(col("raw_purl")).as("plain_purl"))
        .orderBy("p_partkey")
    },

    // F5/F20 — version-string cleanup + contains_alpha
    q("f5_cleanup",
      """SELECT p_partkey,
        |       ltrim(trim(' v' || p_size || '.0'), 'vV') AS clean_version,
        |       (p_name ~ '.*[a-zA-Z].*') AS has_alpha
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          ltrim(trim(concat(lit(" v"), col("p_size"), lit(".0"))), "vV")
            .as("clean_version"),
          col("p_name").rlike("[a-zA-Z]").as("has_alpha"))
        .orderBy("p_partkey")
    },

    // F7 — normalize_text: lowercase, strip all whitespace
    q("f7_normalize_text",
      """SELECT doc_id,
        |       lower(regexp_replace(text, '\s', '', 'g')) AS norm
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          lower(regexp_replace(col("text"), "\\s", "")).as("norm"))
        .orderBy("doc_id")
    },

    // F8/F11 — reference id (last URL path segment) + domain extraction
    q("f8_url_parts",
      """SELECT doc_id,
        |       regexp_extract('https://www.' || source ||
        |         '.example.com/advisories/ADV-' || doc_id, '[^/]+$', 0)
        |         AS ref_id,
        |       source || '.example.com' AS domain
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val withUrl = t(s, dir, "documents").withColumn("url",
        concat(lit("https://www."), col("source"),
          lit(".example.com/advisories/ADV-"), col("doc_id")))
      withUrl.select(col("doc_id"),
        regexp_extract(col("url"), "[^/]+$", 0).as("ref_id"),
        GraftFunctions.urlDomainUdf(col("url")).as("domain"))
        .orderBy("doc_id")
    },

    // F9/F10 — alias classification + URL derivation (when/otherwise chain)
    q("f9_alias_classify",
      """SELECT event_id, alias,
        |       CASE WHEN alias LIKE 'CVE-%' THEN 'cve'
        |            WHEN alias LIKE 'GHSA-%' THEN 'ghsa'
        |            WHEN alias LIKE 'RHSA-%' THEN 'rhsa'
        |            ELSE 'other' END AS alias_type,
        |       CASE WHEN alias LIKE 'CVE-%'
        |              THEN 'https://nvd.nist.gov/vuln/detail/' || alias
        |            WHEN alias LIKE 'GHSA-%'
        |              THEN 'https://github.com/advisories/' || alias
        |            ELSE NULL END AS alias_url
        |FROM (SELECT event_id,
        |             CASE WHEN event_type = 'error' THEN 'CVE-2024-' || event_id
        |                  WHEN event_type = 'purchase' THEN 'GHSA-' || event_id
        |                  WHEN event_type = 'signup' THEN 'RHSA-2024:' || event_id
        |                  ELSE 'LOCAL-' || event_id END AS alias
        |      FROM events) ORDER BY event_id""") { (s, dir) =>
      val withAlias = t(s, dir, "events").select(col("event_id"),
        when(col("event_type") === "error",
          concat(lit("CVE-2024-"), col("event_id")))
          .when(col("event_type") === "purchase",
            concat(lit("GHSA-"), col("event_id")))
          .when(col("event_type") === "signup",
            concat(lit("RHSA-2024:"), col("event_id")))
          .otherwise(concat(lit("LOCAL-"), col("event_id"))).as("alias"))
      withAlias.select(col("event_id"), col("alias"),
        when(col("alias").startsWith("CVE-"), "cve")
          .when(col("alias").startsWith("GHSA-"), "ghsa")
          .when(col("alias").startsWith("RHSA-"), "rhsa")
          .otherwise("other").as("alias_type"),
        when(col("alias").startsWith("CVE-"),
          concat(lit("https://nvd.nist.gov/vuln/detail/"), col("alias")))
          .when(col("alias").startsWith("GHSA-"),
            concat(lit("https://github.com/advisories/"), col("alias")))
          .otherwise(lit(null)).as("alias_url"))
        .orderBy("event_id")
    },

    // F12 — CVSS v3.1 base score computed by the Scala engine, oracle
    // re-derives it arithmetically (unchanged-scope formula)
    q("f12_cvss_score",
      """WITH v AS (
        |  SELECT event_id,
        |         CASE WHEN value > 100 THEN 0.77 ELSE 0.44 END AS ac,
        |         CASE WHEN event_type IN ('error','purchase') THEN 0.56
        |              WHEN event_type = 'signup' THEN 0.22 ELSE 0.0 END AS c,
        |         CASE WHEN event_type = 'error' THEN 0.56 ELSE 0.22 END AS i
        |  FROM events)
        |SELECT event_id,
        |       CASE WHEN (1 - (1-c)*(1-i)) <= 0 THEN 0.0
        |            ELSE ceil(least(6.42 * (1 - (1-c)*(1-i)) +
        |                 8.22 * 0.85 * ac * 0.85 * 0.85, 10.0) * 10) / 10
        |       END AS base_score
        |FROM v ORDER BY event_id""") { (s, dir) =>
      val vec = t(s, dir, "events").select(col("event_id"),
        concat(lit("CVSS:3.1/AV:N/AC:"),
          when(col("value") > 100, "L").otherwise("H"),
          lit("/PR:N/UI:N/S:U/C:"),
          when(col("event_type").isin("error", "purchase"), "H")
            .when(col("event_type") === "signup", "L").otherwise("N"),
          lit("/I:"), when(col("event_type") === "error", "H").otherwise("L"),
          lit("/A:N")).as("vector"))
      vec.select(col("event_id"),
        GraftFunctions.cvssBaseScoreUdf(col("vector")).as("base_score"))
        .orderBy("event_id")
    },

    // F12b — CVSS v4.0 MacroVector base score (Cvss4.baseScore) over a
    // synthetic vector grid. The oracle pins the score of each distinct
    // (AV, VC, VI) combination: constants are the FIRST v4.0 MacroVector
    // algorithm's output, cross-validated bit-exact against the published
    // scores in the reference's fixture files (e.g. AV:N/VC:H/VI:H grid
    // cell = the 9.3 suse-cvss-scores-expected.json vector).
    q("f12b_cvss4_score",
      """SELECT event_id,
        |       CASE WHEN event_type = 'error'
        |              THEN (CASE WHEN value > 100 THEN 9.3 ELSE 8.6 END)
        |            WHEN event_type = 'purchase'
        |              THEN (CASE WHEN value > 100 THEN 8.8 ELSE 7.1 END)
        |            WHEN event_type = 'signup'
        |              THEN (CASE WHEN value > 100 THEN 6.9 ELSE 5.3 END)
        |            ELSE 0.0 END AS base_score
        |FROM events ORDER BY event_id""") { (s, dir) =>
      val vec = t(s, dir, "events").select(col("event_id"),
        concat(lit("CVSS:4.0/AV:"),
          when(col("value") > 100, "N").otherwise("A"),
          lit("/AC:L/AT:N/PR:N/UI:N/VC:"),
          when(col("event_type").isin("error", "purchase"), "H")
            .when(col("event_type") === "signup", "L").otherwise("N"),
          lit("/VI:"),
          when(col("event_type") === "error", "H")
            .when(col("event_type").isin("purchase", "signup"), "L")
            .otherwise("N"),
          lit("/VA:N/SC:N/SI:N/SA:N")).as("vector"))
      vec.select(col("event_id"),
        GraftFunctions.cvssBaseScoreUdf(col("vector")).as("base_score"))
        .orderBy("event_id")
    },

    // F14 — textual severity → numeric score map (risk.py:30-38; the
    // unmapped "none" takes the unknown-textual score 0, risk.py:56)
    q("f14_severity_score",
      """SELECT event_id,
        |       CASE WHEN event_type = 'error' THEN 10.0
        |            WHEN event_type = 'purchase' THEN 8.9
        |            WHEN event_type = 'signup' THEN 6.9
        |            WHEN event_type = 'click' THEN 3.0
        |            ELSE 0.0 END AS score
        |FROM events ORDER BY event_id""") { (s, dir) =>
      val sevText = t(s, dir, "events").select(col("event_id"),
        when(col("event_type") === "error", "critical")
          .when(col("event_type") === "purchase", "HIGH")
          .when(col("event_type") === "signup", "moderate")
          .when(col("event_type") === "click", "low")
          .otherwise("none").as("sev"))
      sevText.select(col("event_id"),
        GraftFunctions.severityScoreUdf(col("sev")).as("score"))
        .orderBy("event_id")
    },

    // F15 — hash functions (sha256 in A11; md5 + sha1-style here)
    q("f15_hashes",
      """SELECT doc_id, md5(text) AS md5_hash,
        |       sha256(text || '|' || lang) AS sha_hash
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("md5_hash"),
          sha2(concat_ws("|", col("text"), col("lang")), 256).as("sha_hash"))
        .orderBy("doc_id")
    },

    // F16 — date handling: UTC month truncation + counts
    q("f16_date_trunc",
      """SELECT date_trunc('month', o_orderdate) AS month, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("month")
    },

    // F18 — build_description: merge summary+description unless contained
    q("f18_build_description",
      """SELECT doc_id,
        |       CASE WHEN contains(text, substr(text, 1, 10))
        |              AND length(text) > 10 THEN text
        |            ELSE substr(text, 1, 10) || chr(10) || text END AS description
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("summary", substring(col("text"), 1, 10))
      d.select(col("doc_id"),
        when(col("text").contains(col("summary")) && length(col("text")) > 10,
          col("text"))
          .otherwise(concat_ws("\n", col("summary"), col("text")))
          .as("description"))
        .orderBy("doc_id")
    },

    // F21 — commit-hash validation regex
    q("f21_commit_check",
      """SELECT doc_id, md5(text) AS maybe_commit,
        |       (md5(text) ~ '^[0-9a-f]{7,40}$') AS is_commit,
        |       (source ~ '^[0-9a-f]{7,40}$') AS source_is_commit
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("maybe_commit"),
          md5(col("text")).rlike("^[0-9a-f]{7,40}$").as("is_commit"),
          col("source").rlike("^[0-9a-f]{7,40}$").as("source_is_commit"))
        .orderBy("doc_id")
    },

    // F23 — Decimal HALF_UP rounding parity
    q("f23_round_halfup",
      """SELECT o_orderkey,
        |       CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 1) AS DOUBLE)
        |         AS rounded1,
        |       CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) *
        |                  CAST(0.5 AS DECIMAL(2,1)), 1) AS DOUBLE) AS half1
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice").cast("decimal(12,2)"), 1).cast("double")
            .as("rounded1"),
          round(col("o_totalprice").cast("decimal(12,2)") *
            lit(BigDecimal("0.5")).cast("decimal(2,1)"), 1).cast("double")
            .as("half1"))
        .orderBy("o_orderkey")
    },

    // F24 — CWE dimension lookup (models.py:552-582): the bundled
    // catalog resource (CweCatalog) as a broadcast dim join; ids spread
    // over 0..1399 so hits resolve canonical names and misses fall back
    // to 'unknown'. The oracle reads the SAME TSV the loader bundles.
    q("f24_cwe_lookup",
      s"""WITH d AS (SELECT * FROM read_csv('$CwePath', delim='\\t',
         |  header=false, quote='',
         |  columns={'cwe_id_num':'INTEGER','name':'VARCHAR'}))
         |SELECT p.p_partkey,
         |       'CWE-' || CAST(p.p_partkey % 1400 AS VARCHAR) AS cwe_id,
         |       coalesce(d.name, 'unknown') AS cwe_name
         |FROM part p LEFT JOIN d ON p.p_partkey % 1400 = d.cwe_id_num
         |ORDER BY p.p_partkey""") { (s, dir) =>
      val dim = graft.functions.CweCatalog.dim(s)
      t(s, dir, "part")
        .select(col("p_partkey"),
          pmod(col("p_partkey"), lit(1400)).cast("int").as("cwe_id_num"))
        .join(broadcast(dim), Seq("cwe_id_num"), "left")
        .select(col("p_partkey"),
          concat(lit("CWE-"), col("cwe_id_num")).as("cwe_id"),
          coalesce(col("name"), lit("unknown")).as("cwe_name"))
        .orderBy("p_partkey")
    },

    // F6 — clean_summary: strip + NUL → U+FFFD (importer.py:717-723),
    // exercised on text with injected NULs and edge whitespace
    q("f6_clean_summary",
      """SELECT doc_id,
        |       replace(trim(chr(0) || ' ' || text || '  '),
        |               chr(0), chr(65533)) AS cleaned
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        GraftFunctions.cleanSummaryUdf(
          concat(lit("\u0000 "), col("text"), lit("  "))).as("cleaned"))
        .orderBy("doc_id")
    },

    // F13 — SSVC coordinator decision + vector over the full input grid
    // (the 36-entry CISA table; the oracle re-derives decisions from the
    // published table and letters from the vector convention)
    q("f13_ssvc_decision",
      """WITH g AS (
        |  SELECT event_id,
        |         CASE WHEN event_type = 'error' THEN 'active'
        |              WHEN event_type = 'purchase' THEN 'poc'
        |              ELSE 'none' END AS e,
        |         CASE WHEN value > 100 THEN 'yes' ELSE 'no' END AS a,
        |         CASE WHEN event_type IN ('error','signup') THEN 'total'
        |              ELSE 'partial' END AS t,
        |         CASE WHEN user_id % 3 = 0 THEN 'high'
        |              WHEN user_id % 3 = 1 THEN 'medium'
        |              ELSE 'low' END AS m
        |  FROM events),
        |d AS (
        |  SELECT event_id, e, a, t, m,
        |    CASE e || '|' || a || '|' || t || '|' || m
        |      WHEN 'none|no|partial|low' THEN 'Track'
        |      WHEN 'none|no|partial|medium' THEN 'Track'
        |      WHEN 'none|no|partial|high' THEN 'Track'
        |      WHEN 'none|no|total|low' THEN 'Track'
        |      WHEN 'none|no|total|medium' THEN 'Track'
        |      WHEN 'none|no|total|high' THEN 'Track*'
        |      WHEN 'none|yes|partial|low' THEN 'Track'
        |      WHEN 'none|yes|partial|medium' THEN 'Track'
        |      WHEN 'none|yes|partial|high' THEN 'Attend'
        |      WHEN 'none|yes|total|low' THEN 'Track'
        |      WHEN 'none|yes|total|medium' THEN 'Track'
        |      WHEN 'none|yes|total|high' THEN 'Attend'
        |      WHEN 'poc|no|partial|low' THEN 'Track'
        |      WHEN 'poc|no|partial|medium' THEN 'Track'
        |      WHEN 'poc|no|partial|high' THEN 'Track*'
        |      WHEN 'poc|no|total|low' THEN 'Track'
        |      WHEN 'poc|no|total|medium' THEN 'Track*'
        |      WHEN 'poc|no|total|high' THEN 'Attend'
        |      WHEN 'poc|yes|partial|low' THEN 'Track'
        |      WHEN 'poc|yes|partial|medium' THEN 'Track'
        |      WHEN 'poc|yes|partial|high' THEN 'Attend'
        |      WHEN 'poc|yes|total|low' THEN 'Track'
        |      WHEN 'poc|yes|total|medium' THEN 'Track*'
        |      WHEN 'poc|yes|total|high' THEN 'Attend'
        |      WHEN 'active|no|partial|low' THEN 'Track'
        |      WHEN 'active|no|partial|medium' THEN 'Track'
        |      WHEN 'active|no|partial|high' THEN 'Attend'
        |      WHEN 'active|no|total|low' THEN 'Track'
        |      WHEN 'active|no|total|medium' THEN 'Attend'
        |      WHEN 'active|no|total|high' THEN 'Act'
        |      WHEN 'active|yes|partial|low' THEN 'Attend'
        |      WHEN 'active|yes|partial|medium' THEN 'Attend'
        |      WHEN 'active|yes|partial|high' THEN 'Act'
        |      WHEN 'active|yes|total|low' THEN 'Attend'
        |      WHEN 'active|yes|total|medium' THEN 'Act'
        |      WHEN 'active|yes|total|high' THEN 'Act'
        |    END AS decision
        |  FROM g)
        |SELECT event_id, decision,
        |       'SSVCv2/E:' ||
        |         CASE e WHEN 'active' THEN 'A' WHEN 'poc' THEN 'P'
        |                ELSE 'N' END ||
        |       '/A:' || CASE a WHEN 'yes' THEN 'Y' ELSE 'N' END ||
        |       '/T:' || CASE t WHEN 'total' THEN 'T' ELSE 'P' END ||
        |       '/M:' || CASE m WHEN 'high' THEN 'H' WHEN 'medium' THEN 'M'
        |                       ELSE 'L' END ||
        |       '/D:' || CASE decision WHEN 'Act' THEN 'C'
        |                  WHEN 'Attend' THEN 'A' WHEN 'Track*' THEN 'R'
        |                  ELSE 'T' END || '/' AS vector
        |FROM d ORDER BY event_id""") { (s, dir) =>
      val g = t(s, dir, "events").select(col("event_id"),
        when(col("event_type") === "error", "active")
          .when(col("event_type") === "purchase", "poc")
          .otherwise("none").as("e"),
        when(col("value") > 100, "yes").otherwise("no").as("a"),
        when(col("event_type").isin("error", "signup"), "total")
          .otherwise("partial").as("t"),
        when(pmod(col("user_id"), lit(3)) === 0, "high")
          .when(pmod(col("user_id"), lit(3)) === 1, "medium")
          .otherwise("low").as("m"))
      g.select(col("event_id"),
        GraftFunctions.ssvcDecisionUdf(col("e"), col("a"), col("t"),
          col("m")).as("decision"),
        GraftFunctions.ssvcVectorUdf(col("e"), col("a"), col("t"),
          col("m")).as("vector"))
        .orderBy("event_id")
    },

    // F19 — markdown front-matter split (utils.py:91-107): half the docs
    // get a synthetic front-matter block, half stay plain
    q("f19_front_matter",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'lang: ' || lang
        |            ELSE '' END AS front,
        |       text AS body
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val input = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("---\nlang: "), col("lang"), lit("\n---\n"), col("text")))
        .otherwise(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
        GraftFunctions.frontMatterUdf(input).as("fm"))
        .select(col("doc_id"), col("fm._1").as("front"),
          col("fm._2").as("body"))
        .orderBy("doc_id")
    },

    // F22 — patch-source classification (pipes/advisory.py:203-250)
    q("f22_patch_classify",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'commit_patch'
        |            WHEN doc_id % 3 = 1 THEN 'patch'
        |            ELSE 'reference' END AS source_kind
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val url = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("https://github.com/o/r/commit/"), md5(col("text"))))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("https://host/fix-"), col("doc_id"), lit(".patch")))
        .otherwise(concat(lit("https://host/ref/"), col("doc_id")))
      t(s, dir, "documents").select(col("doc_id"),
        GraftFunctions.patchSourceUdf(url).as("source_kind"))
        .orderBy("doc_id")
    },
  )
}
