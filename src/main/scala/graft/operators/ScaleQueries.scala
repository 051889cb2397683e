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

    // Salt-replicated skew join == plain join (aggregated to hold the
    // row count at the group grain; the join itself is the thing under
    // test — a hot l_orderkey spreads over 8 reducers instead of 1)
    q("sc4_salted_join",
      """SELECT o.o_orderpriority, l.l_returnflag,
        |       count(*) AS li_cnt,
        |       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(12,2))), 2)
        |            AS DOUBLE) AS qty
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderpriority, l.l_returnflag
        |ORDER BY o.o_orderpriority, l.l_returnflag""") { (s, dir) =>
      val dim = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(t(s, dir, "lineitem"), dim, "l_orderkey", salts = 8)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(count(lit(1)).as("li_cnt"),
          round(sum(col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double").as("qty"))
        .orderBy("o_orderpriority", "l_returnflag")
    },

    // Bucketed co-located join == plain join: both sides pre-bucketed by
    // the join key (the write pays the shuffle once), then a merge join
    // with NO Exchange on either side (BucketedJoinSpec pins the plan).
    // The oracle re-derives from the raw parquet — bucket files must be
    // a pure re-layout, never a re-interpretation, of the data.
    q("sc5_bucketed_join",
      """SELECT c.c_mktsegment, count(*) AS order_cnt,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)
        |            AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""") { (s, dir) =>
      val base = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_bucketed").toString
      graft.sources.Bucketed.write(
        t(s, dir, "orders").withColumnRenamed("o_custkey", "cust_id"),
        "graft_buck_orders", s"$base/orders", "cust_id", buckets = 8)
      graft.sources.Bucketed.write(
        t(s, dir, "customer").withColumnRenamed("c_custkey", "cust_id"),
        "graft_buck_customer", s"$base/customer", "cust_id", buckets = 8)
      val o = graft.sources.Bucketed.table(s, "graft_buck_orders")
      val c = graft.sources.Bucketed.table(s, "graft_buck_customer")
      o.hint("merge").join(c, Seq("cust_id"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"),
          round(sum(col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double").as("total"))
        .orderBy("c_mktsegment")
    },

    // Range-partitioned global running sum == global window prefix sum
    // (the W7-style single-partition sort hazard, solved the same way
    // as sc2 — per-partition prefix sums + broadcast offsets)
    q("sc6_running_sum",
      """SELECT o_orderkey,
        |       CAST(sum(o_custkey % 1000) OVER (ORDER BY o_orderkey)
        |            AS BIGINT) AS running_sum
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(1000)).as("v"))
      Skew.globalRunningSum(o, col("o_orderkey"), col("v"),
          numPartitions = 16)
        .select("o_orderkey", "running_sum")
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
