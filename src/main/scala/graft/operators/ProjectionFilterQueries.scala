package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projections / filters / predicates (P1–P10).
  *
  * Each reference ORM predicate class re-expressed as a declarative Spark
  * filter so Catalyst pushes it into the parquet scan (verify with
  * `.explain`: `PushedFilters`).
  *
  * Reference semantics: vulnerabilities/models.py:114-176 (queryset filter
  * helpers), pipes/export.py:27 (projection), models.py:3576-3579
  * (istartswith), api.py:737-739 (icontains search).
  */
object ProjectionFilterQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // P1 — column projection (.only / .values)
    q("p1_project",
      "SELECT p_partkey, p_name FROM part ORDER BY p_partkey") { (s, dir) =>
      t(s, dir, "part").select("p_partkey", "p_name").orderBy("p_partkey")
    },

    // P2 — equality filter (models.py:126-142 for_cpe/for_cve style)
    q("p2_filter_eq",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // P3 — prefix predicate (__startswith, models.py:120-124)
    q("p3_prefix",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE 'blue%' ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").startsWith("blue"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // P4 — case-insensitive substring (__icontains, models.py:169-176)
    q("p4_icontains",
      """SELECT doc_id, lang FROM documents
        |WHERE lower(text) LIKE '%spark%' ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .filter(lower(col("text")).contains("spark"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // P6 — boolean OR/AND trees via Q(...) (models.py:1357-1362)
    q("p6_bool_tree",
      """SELECT l_returnflag, count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_quantity > 45) AND l_discount <= 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_quantity") > 45) &&
          col("l_discount") <= 0.05)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // P7 — exclusion (.exclude, models.py:483)
    q("p7_exclude",
      """SELECT p_type, count(*) AS cnt FROM part
        |WHERE p_type <> 'PROMO' GROUP BY p_type ORDER BY p_type""") { (s, dir) =>
      t(s, dir, "part")
        .filter(!(col("p_type") === "PROMO"))
        .groupBy("p_type").agg(count(lit(1)).as("cnt"))
        .orderBy("p_type")
    },

    // P8 — range predicates __gt/__gte/__lte (pipes/export.py:60-66 watermark)
    q("p8_range",
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_totalprice >= 1000 AND o_totalprice < 50000
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice") >= 1000 && col("o_totalprice") < 50000 &&
          col("o_orderdate") >= to_timestamp(lit("1995-01-01")))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // P9 — dedup .distinct() (models.py:695, api.py:523)
    q("p9_distinct",
      """SELECT DISTINCT o_custkey, o_orderstatus FROM orders
        |ORDER BY o_custkey, o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .select("o_custkey", "o_orderstatus").distinct()
        .orderBy("o_custkey", "o_orderstatus")
    },

    // P10 — conjunctive serving guard (latest+unfurled style, models.py:2946)
    q("p10_guard",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100
        |  AND ts >= TIMESTAMP '2024-01-02'
        |ORDER BY event_id""") { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value") > 100 &&
          col("ts") >= to_timestamp(lit("2024-01-02")))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },
  )
}
