package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path equivalence queries: the skew-safe formulations must return
  * byte-identical answers to their naive forms — proven through the
  * oracle gate, which re-derives each result the straightforward way.
  */
object ScaleQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // Salted exact distinct-count == plain COUNT(DISTINCT)
    q("sc1_salted_distinct",
      """SELECT l_partkey AS key, count(DISTINCT l_orderkey) AS distinct_cnt
        |FROM lineitem GROUP BY l_partkey ORDER BY key""") { (s, dir) =>
      Skew.saltedCountDistinct(t(s, dir, "lineitem"),
        col("l_partkey"), col("l_orderkey"))
        .orderBy("key")
    },

    // Range-partitioned global row numbering == global window row_number
    q("sc2_scalable_global_rank",
      """SELECT o_orderkey,
        |       row_number() OVER (ORDER BY o_totalprice, o_orderkey)
        |         AS row_number
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      val ordered = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      Skew.globalRowNumber(ordered,
        struct(col("o_totalprice"), col("o_orderkey")), numPartitions = 16)
        .select("o_orderkey", "row_number")
        .orderBy("o_orderkey")
    },

    // Two-phase per-key top-k == windowed top-k
    q("sc3_topk_per_key",
      """SELECT l_partkey, l_orderkey, round(l_extendedprice, 2) AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
        |                 l_quantity) AS rn
        |      FROM lineitem) WHERE rn <= 3
        |ORDER BY l_partkey, rn""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      // total order key so duplicates cannot make top-k ambiguous
      val orderKey = struct(col("l_extendedprice"),
        (-col("l_orderkey")).as("o"), (-col("l_linenumber")).as("l"),
        (-col("l_quantity")).as("q"))
      Skew.topKPerKey(li, col("l_partkey"), orderKey, 3)
        .select(col("l_partkey"), col("l_orderkey"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_partkey"), col("rank"))
    },
  )
}
