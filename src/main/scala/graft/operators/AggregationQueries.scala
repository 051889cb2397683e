package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregations (A1–A13).
  *
  * All are hash aggregates with map-side partial aggregation (Spark does
  * partial_count/partial_max before the shuffle — at 100 TB the shuffle
  * carries one row per (partition, key), not per input row).
  *
  * Reference: models.py:180-184 (A1 with_package_counts),
  * models.py:3585-3595 (A2), pipes/risk_score.py:31-58 (A3 Max),
  * api_v3.py:591-597 (A4 ArrayAgg), risk.py:21-61 (A5 weighted severity),
  * risk.py:64-92 (A6 exploitability cascade), models.py:305-315 (A7 risk),
  * risk.py:108-121 (A8 package risk), utils.py:512-545 (A10 range string),
  * utils.py:623-691 (A11 canonical content id),
  * compute_advisory_todo.py:200-307 (A12 conflict matrix),
  * flag_ghost_packages.py:44-48 (A13).
  */
object AggregationQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** A5/A6/A7 analog of risk.py: severity weight per source kind. */
  private val weightExpr =
    expr("""CASE event_type WHEN 'purchase' THEN 10 WHEN 'error' THEN 8
           | WHEN 'signup' THEN 6 WHEN 'click' THEN 5 ELSE 2 END""".stripMargin)

  private val weightSql =
    """CASE event_type WHEN 'purchase' THEN 10 WHEN 'error' THEN 8
      | WHEN 'signup' THEN 6 WHEN 'click' THEN 5 ELSE 2 END""".stripMargin

  override val entries: Seq[QueryEntry] = Seq(
    // A1 — count-distinct annotations per parent
    q("a1_count_distinct",
      """SELECT n.n_name,
        |       count(DISTINCT o.o_custkey) AS active_customers,
        |       count(*) AS order_cnt
        |FROM nation n
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY n.n_name ORDER BY n.n_name""") { (s, dir) =>
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(countDistinct("o_custkey").as("active_customers"),
          count(lit(1)).as("order_cnt"))
        .orderBy("n_name")
    },

    // A2 — per-entity distinct-child counts (vulnerability counts per package)
    q("a2_child_counts",
      """SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(countDistinct("l_orderkey").as("n_orders"))
        .orderBy("l_partkey")
    },

    // A3 — Max aggregate per group
    q("a3_max",
      """SELECT o_custkey, round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(round(max("o_totalprice"), 2).as("max_price"))
        .orderBy("o_custkey")
    },

    // A4 — filtered distinct array-agg, canonical string serialization
    q("a4_collect_filtered",
      """SELECT o_custkey,
        |       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |         AS f_priorities
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_custkey ORDER BY o_custkey""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_set("o_orderpriority")), ",")
          .as("f_priorities"))
        .orderBy("o_custkey")
    },

    // A5 — weighted severity: max(score × source-weight) per entity
    q("a5_weighted_severity",
      s"""SELECT user_id,
         |       round(max(value * ($weightSql)), 2) AS weighted_severity
         |FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(round(max(col("value") * weightExpr), 2).as("weighted_severity"))
        .orderBy("user_id")
    },

    // A5b — weighted severity through the REAL ~2,900-domain weight table
    // (weight_config.py via SeverityWeights) and the REAL advisoryRisk
    // derive: severity URLs rotate over four non-default-weight domains
    // (nvd.nist.gov 9, rustsec.org 8 — behind a www. prefix to exercise
    // the strip, issues.apache.org 7, advisory.checkmarx.net 6) plus an
    // unlisted domain (default 5); a second default-weight severity makes
    // the max genuinely compare sources; a URL-less `urgent` severity is
    // a canary for the risk.py:42-43 skip (wrongly included it would
    // contribute 5.0 and shift every row whose true max is lower); an
    // exploit reference on every advisory pins exploitability at 1.0 so
    // risk_score exercises the both-factors-truthy null gate without
    // introducing half-cent rounding midpoints.
    q("a5b_weighted_severity_table",
      """WITH o AS (SELECT DISTINCT o_orderkey % 500 AS k FROM orders),
        |w AS (SELECT k, round(greatest(
        |        CAST(k % 10 AS DOUBLE) *
        |          (CASE k % 5 WHEN 0 THEN 9 WHEN 1 THEN 8 WHEN 2 THEN 7
        |                      WHEN 3 THEN 6 ELSE 5 END) / 10.0,
        |        CAST((k * 3) % 10 AS DOUBLE) * 5 / 10.0), 1)
        |        AS weighted_severity
        |      FROM o)
        |SELECT 'adv/' || CAST(k AS VARCHAR) AS avid,
        |       weighted_severity,
        |       CAST(1.0 AS DOUBLE) AS exploitability,
        |       CASE WHEN weighted_severity > 0
        |            THEN round(least(weighted_severity
        |                             * CAST(1.0 AS DOUBLE), 10), 1)
        |       END AS risk_score
        |FROM w ORDER BY avid""") { (s, dir) =>
      val refType = "array<struct<reference_id:string," +
        "reference_type:string,url:string>>"
      val domains = array(
        lit("https://nvd.nist.gov/vuln/detail/x"),
        lit("https://www.rustsec.org/advisories/x"),
        lit("https://issues.apache.org/jira/x"),
        lit("https://advisory.checkmarx.net/x"),
        lit("https://unlisted.example/adv/x"))
      val sevStruct = (value: org.apache.spark.sql.Column,
          url: org.apache.spark.sql.Column) =>
        struct(lit("generic").as("scoring_system"),
          value.as("value"), lit("").as("scoring_elements"),
          url.as("url"))
      val adv = t(s, dir, "orders")
        .select(pmod(col("o_orderkey"), lit(500)).as("k")).distinct()
        .select(
          concat(lit("adv/"), col("k")).as("avid"),
          lit(true).as("is_latest"),
          array(
            sevStruct(pmod(col("k"), lit(10)).cast("string"),
              element_at(domains, (pmod(col("k"), lit(5)) + 1)
                .cast("int"))),
            sevStruct(pmod(col("k") * 3, lit(10)).cast("string"),
              lit("https://other.example/x")),
            sevStruct(lit("urgent"), lit(""))).as("severities"),
          array(struct(lit("x").as("reference_id"),
            lit("exploit").as("reference_type"),
            lit("https://exploit.example/e").as("url")))
            .cast(refType).as("references"))
      graft.derive.AdvisoryDerive.advisoryRisk(adv).orderBy("avid")
    },

    // A6 — exploitability cascade: max(when) priority ladder
    q("a6_exploitability",
      """SELECT user_id,
        |       max(CASE WHEN event_type = 'error' THEN 2.0
        |                WHEN event_type = 'purchase' THEN 1.0
        |                ELSE 0.5 END) AS exploitability
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "error", 2.0)
          .when(col("event_type") === "purchase", 1.0)
          .otherwise(0.5)).as("exploitability"))
        .orderBy("user_id")
    },

    // A7 — risk = min(weighted_severity × exploitability, cap) (models.py:305-315)
    q("a7_risk",
      s"""SELECT user_id,
         |       least(round(max(value * ($weightSql)) / 1000, 2) *
         |             max(CASE WHEN event_type = 'error' THEN 2.0
         |                      WHEN event_type = 'purchase' THEN 1.0
         |                      ELSE 0.5 END), 10.0) AS risk_score
         |FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(least(
          round(max(col("value") * weightExpr) / 1000, 2) *
            max(when(col("event_type") === "error", 2.0)
              .when(col("event_type") === "purchase", 1.0)
              .otherwise(0.5)),
          lit(10.0)).as("risk_score"))
        .orderBy("user_id")
    },

    // A8 — package risk = max over related entities (two-level max)
    q("a8_group_max",
      """SELECT n.n_name, round(max(o.o_totalprice), 2) AS max_order
        |FROM nation n
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY n.n_name ORDER BY n.n_name""") { (s, dir) =>
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      t(s, dir, "orders")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(max("o_totalprice"), 2).as("max_order"))
        .orderBy("n_name")
    },

    // A9 — plain counts per group (control-flow .count()/.exists())
    q("a9_counts",
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // A10 — min–max range string from mixed values (utils.py:512-545)
    q("a10_range_string",
      """SELECT p_type,
        |       printf('%.2f', min(p_retailprice)) || '-' ||
        |       printf('%.2f', max(p_retailprice)) AS price_range
        |FROM part GROUP BY p_type ORDER BY p_type""") { (s, dir) =>
      t(s, dir, "part")
        .groupBy("p_type")
        .agg(concat(
          format_string("%.2f", min("p_retailprice")), lit("-"),
          format_string("%.2f", max("p_retailprice"))).as("price_range"))
        .orderBy("p_type")
    },

    // A11 — canonical content id: sha256 over normalized canonical string
    q("a11_content_hash",
      """SELECT doc_id,
        |       sha256(lower(trim(text)) || '|' || lang || '|' || source)
        |         AS content_id
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          sha2(concat_ws("|", lower(trim(col("text"))), col("lang"),
            col("source")), 256).as("content_id"))
        .orderBy("doc_id")
    },

    // A12 — conflict matrix: entities whose per-day event-type profiles
    // disagree across days (>1 distinct profile ⇒ conflict)
    q("a12_conflict_matrix",
      """SELECT user_id, count(DISTINCT profile) AS n_profiles FROM (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         string_agg(DISTINCT event_type, ',' ORDER BY event_type)
        |           AS profile
        |  FROM events GROUP BY user_id, CAST(ts AS DATE))
        |GROUP BY user_id HAVING count(DISTINCT profile) > 1
        |ORDER BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(array_join(array_sort(collect_set("event_type")), ",")
          .as("profile"))
        .groupBy("user_id")
        .agg(countDistinct("profile").as("n_profiles"))
        .filter(col("n_profiles") > 1)
        .orderBy("user_id")
    },

    // A14 — severity_range_score (api.py:259-281, utils.py:512-545):
    // textual buckets expand to [lo, hi], numerics pass through
    // (Python-float grammar, Cvss.NumericScoreRe), unknown words drop,
    // "min - max" per group — with the low bucket's upper bound
    // rendered as the reference's INT 3 unless a numeric 3.0 parsed
    q("a14_severity_range",
      s"""WITH v0 AS (
        |  SELECT p_brand,
        |         CASE p_size % 5
        |           WHEN 0 THEN 'LOW' WHEN 1 THEN 'critical'
        |           WHEN 2 THEN 'unknown'
        |           WHEN 3 THEN CAST(p_size AS VARCHAR)
        |           ELSE 'Medium' END AS val
        |  FROM part),
        |-- Java-trim parity with the engine twins: strip every char
        |-- <= U+0020 on both ends ('g' so the trailing run strips too)
        |v AS (
        |  SELECT p_brand,
        |         regexp_replace(val,
        |           '^[\\x00-\\x20]+|[\\x00-\\x20]+$$', '', 'g') AS tval
        |  FROM v0),
        |e AS (
        |  SELECT p_brand, x
        |  FROM v, LATERAL unnest(
        |    CASE lower(tval)
        |      WHEN 'low' THEN [0.1, 3.0]
        |      WHEN 'moderate' THEN [4.0, 6.9]
        |      WHEN 'medium' THEN [4.0, 6.9]
        |      WHEN 'high' THEN [7.0, 8.9]
        |      WHEN 'important' THEN [7.0, 8.9]
        |      WHEN 'critical' THEN [9.0, 10.0]
        |      ELSE CASE WHEN regexp_matches(tval,
        |             '${graft.functions.Cvss.NumericScoreRe}')
        |             AND isfinite(TRY_CAST(tval AS DOUBLE))
        |             AND abs(TRY_CAST(tval AS DOUBLE)) < 1e16
        |                THEN [CAST(tval AS DOUBLE) + 0.0]
        |                ELSE [] END END) AS t(x)),
        |f AS (
        |  SELECT p_brand,
        |         bool_or(lower(tval) = 'low') AS low_used,
        |         bool_or(regexp_matches(tval,
        |             '${graft.functions.Cvss.NumericScoreRe}')
        |           AND isfinite(TRY_CAST(tval AS DOUBLE))
        |           AND abs(TRY_CAST(tval AS DOUBLE)) < 1e16
        |           AND TRY_CAST(tval AS DOUBLE) = 3.0) AS num3
        |  FROM v GROUP BY p_brand)
        |SELECT e.p_brand,
        |       CAST(min(x) AS VARCHAR) || ' - ' ||
        |         CASE WHEN max(x) = 3.0 AND f.low_used AND NOT f.num3
        |              THEN '3' ELSE CAST(max(x) AS VARCHAR) END
        |           AS severity_range
        |FROM e JOIN f USING (p_brand)
        |GROUP BY e.p_brand, f.low_used, f.num3
        |ORDER BY p_brand""") { (s, dir) =>
      val v = t(s, dir, "part").select(col("p_brand"),
        when(pmod(col("p_size"), lit(5)) === 0, "LOW")
          .when(pmod(col("p_size"), lit(5)) === 1, "critical")
          .when(pmod(col("p_size"), lit(5)) === 2, "unknown")
          .when(pmod(col("p_size"), lit(5)) === 3,
            col("p_size").cast("string"))
          .otherwise("Medium").as("val"))
      v.groupBy("p_brand")
        .agg(graft.serve.Serving.severityRangeCol(
          collect_list(col("val"))).as("severity_range"))
        .filter(col("severity_range").isNotNull)
        .orderBy("p_brand")
    },

    // A13 — distinct-group count for progress stats (single row)
    q("a13_distinct_count",
      """SELECT count(*) AS n_groups FROM
        |  (SELECT DISTINCT p_brand, p_type FROM part)""") { (s, dir) =>
      t(s, dir, "part")
        .select("p_brand", "p_type").distinct()
        .agg(count(lit(1)).as("n_groups"))
    },
  )
}
