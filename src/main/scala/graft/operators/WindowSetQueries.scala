package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.5 windows/ranking/ordering (W1–W7) + §2.6 set ops (SO1–SO3).
  *
  * All windows are partitioned (shuffle on the partition key only); the one
  * global ranking (W7) is noted as a scale hazard — at 100 TB a global
  * dense_rank would be a single-task sort, so the real engine ranks within
  * partitions (W1 shape) or uses a 2-phase range-partitioned sort.
  *
  * Reference: compute_package_version_rank.py:33-93 (W1),
  * pipes/advisory.py:341-346 (W2 is_latest), models.py:1046-1069 (W3),
  * unfurl_version_range.py:210 (W4 nulls-first), models.py:3868-3869 (W5),
  * pagination.py:5-6 (W6), models.py:968-972 (W7),
  * models.py:3017-3067 (SO1), pipes/export.py:70 (SO2),
  * compute_advisory_todo.py:265-283 (SO3).
  */
object WindowSetQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // W1 — version_rank: rank rows within natural-key group under a
    // deterministic domain order
    q("w1_version_rank",
      """SELECT p_brand, p_partkey,
        |       row_number() OVER (PARTITION BY p_brand
        |                          ORDER BY p_retailprice, p_partkey)
        |         AS version_rank
        |FROM part ORDER BY p_brand, version_rank""") { (s, dir) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice"), col("p_partkey"))
      t(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"),
          row_number().over(w).as("version_rank"))
        .orderBy("p_brand", "version_rank")
    },

    // W2 — latest-per-key (is_latest per avid)
    q("w2_latest_per_key",
      """SELECT o_custkey, o_orderkey AS latest_order, o_orderdate AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) WHERE rn = 1 ORDER BY o_custkey""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
          col("o_orderdate").as("latest_date"))
        .orderBy("o_custkey")
    },

    // W3 — next-in-order lookahead (next non-vulnerable version).
    // The synthetic lineitem has duplicate (l_orderkey, l_linenumber) pairs,
    // so the window order is made total (shipdate, linenumber, price, qty):
    // a non-total ORDER BY makes lead() engine-dependent.
    q("w3_next_in_group",
      """SELECT l_orderkey,
        |       row_number() OVER w AS seq,
        |       l_shipdate AS ship,
        |       lead(l_shipdate) OVER w AS next_ship
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |             ORDER BY l_shipdate, l_linenumber, l_extendedprice, l_quantity)
        |ORDER BY l_orderkey, seq""") { (s, dir) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_shipdate"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          row_number().over(w).as("seq"),
          col("l_shipdate").as("ship"),
          lead("l_shipdate", 1).over(w).as("next_ship"))
        .orderBy("l_orderkey", "seq")
    },

    // W4 — explicit nulls-first ordering (asc(nulls_first=True))
    q("w4_nulls_first",
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders
        |ORDER BY st ASC NULLS FIRST, o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("st"))
        .orderBy(col("st").asc_nulls_first, col("o_orderkey"))
    },

    // W5 — top-1 after order (.first())
    q("w5_top1",
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""") { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .limit(1)
    },

    // W6 — pagination LIMIT/OFFSET (API page size 100)
    q("w6_pagination",
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 200""") { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(200).limit(100)
    },

    // W6b — keyset (seek) pagination: the 100 TB serving path. OFFSET n
    // must order-and-discard n rows every page (w6 above — fine for one
    // API page, quadratic across a deep scan); the keyset form carries
    // the last key of the previous page as a cursor, so the predicate is
    // pushed into the parquet scan (row-group pruning on the sort key)
    // and ORDER BY + LIMIT collapses to TakeOrderedAndProject —
    // per-partition top-k then a k-row merge, never a global sort.
    q("w6b_keyset_page",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey > 800
        |ORDER BY o_orderkey LIMIT 100""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") > 800)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .limit(100)
    },

    // W7 — global re-rank (dense). NOTE: single-partition sort — the 100 TB
    // path is W1's partitioned form; kept to mirror the reference's full
    // re-rank (models.py:968-972).
    q("w7_dense_rank",
      """SELECT p_partkey,
        |       dense_rank() OVER (ORDER BY p_retailprice) AS price_rank
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      val w = Window.orderBy("p_retailprice")
      t(s, dir, "part")
        .select(col("p_partkey"), dense_rank().over(w).as("price_rank"))
        .orderBy("p_partkey")
    },

    // SO1 — union + distinct of id sets
    q("so1_union",
      """SELECT o_custkey AS id FROM orders
        |UNION SELECT user_id AS id FROM events ORDER BY id""") { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("id"))
        .union(t(s, dir, "events").select(col("user_id").as("id")))
        .distinct()
        .orderBy("id")
    },

    // SO2 — union of changed-key sets above a watermark (incremental export)
    q("so2_union_watermark",
      """SELECT o_custkey AS id FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |UNION
        |SELECT user_id AS id FROM events WHERE ts >= TIMESTAMP '2024-01-03'
        |ORDER BY id""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
        .select(col("o_custkey").as("id"))
        .union(t(s, dir, "events")
          .filter(col("ts") >= to_timestamp(lit("2024-01-03")))
          .select(col("user_id").as("id")))
        .distinct()
        .orderBy("id")
    },

    // SO3 — set difference
    q("so3_except",
      """SELECT o_custkey AS id FROM orders
        |EXCEPT SELECT user_id AS id FROM events ORDER BY id""") { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("id"))
        .except(t(s, dir, "events").select(col("user_id").as("id")))
        .orderBy("id")
    },
  )
}
