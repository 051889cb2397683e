package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.3 — joins (J1–J14) + P5 (null-test via outer-join flag).
  *
  * All reference joins are FK/M2M equi-joins plus two theta-join shapes
  * (J7 as-of, J8 version-greater-than). Spark-first design notes:
  *   - dimension sides (region/nation/supplier/customer at these scales,
  *     or the request purl list in J13) are `broadcast()`-hinted: at 100 TB
  *     the fact side (lineitem/events) never shuffles for these joins;
  *   - semi/anti semantics use `left_semi`/`left_anti` (no row duplication,
  *     no wide shuffle of payload columns);
  *   - J7/J8 are equi-join on the group key with a residual range predicate
  *     + partial aggregation, which AQE handles at scale (skew-join split).
  *
  * Reference: models.py:854-863 (J1), models.py:2946-2953 (J2),
  * models.py:802-812 (J3 Exists), models.py:814-824 (J4 anti),
  * models.py:2946-3067 (J5 subquery-IN), models.py:678-695 (J6),
  * utils.py:176-202 (J7 bisect as-of), models.py:416-473 (J8),
  * import_runner.py:283-357 (J9), enhance_with_kev.py:68-99 (J10),
  * relate_severities.py:61-119 (J11), api.py:352-358 (J12 prefetch),
  * api.py:507-545 (J13 bulk IN), api.py:693-731 (J14 CPE/reference).
  */
object JoinQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // J1 — M2M traversal join (package↔vulnerability ≈ customer↔orders↔lineitem)
    // Money sums run in DECIMAL, not double: summation order differs between
    // engines (and between partitionings of the same engine), so a double
    // sum is not reproducible at scale. Decimal partial aggregation is still
    // map-side combinable — exact AND shuffle-efficient.
    q("j1_m2m_join",
      """SELECT c.c_custkey, count(*) AS li_cnt,
        |       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |                      (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2)
        |            AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(c("c_custkey"))
        .agg(count(lit(1)).as("li_cnt"),
          round(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)"))), 2)
            .cast("double").as("revenue"))
        .orderBy("c_custkey")
    },

    // J2 — three-hop join with guard filters pushed below the joins
    q("j2_threehop_guard",
      """SELECT n.n_name, count(*) AS order_cnt,
        |       round(sum(o.o_totalprice), 2) AS total
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY n.n_name ORDER BY n.n_name""") { (s, dir) =>
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(count(lit(1)).as("order_cnt"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("n_name")
    },

    // J3 — existence semi-join (Exists(OuterRef) → is_vulnerable annotation)
    q("j3_semi_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J4 — anti-join (only_non_vulnerable). The exists side is scoped to
    // high-value orders so the result is NON-empty at every SF (a 0-row
    // anti-join matches any join type and proves nothing — r05 verdict #4).
    q("j4_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // P5 — null test as projected outer-join flag (is_vulnerable=False)
    q("p5_null_flag",
      """SELECT c.c_custkey,
        |       (o.o_custkey IS NOT NULL) AS has_orders
        |FROM customer c
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY c.c_custkey""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select("o_custkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(c("c_custkey"), col("o_custkey").isNotNull.as("has_orders"))
        .orderBy("c_custkey")
    },

    // J5 — subquery-IN join (filter(id__in=Subquery(...)))
    q("j5_subquery_in",
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      val rich = t(s, dir, "customer")
        .filter(col("c_acctbal") > 9000).select("c_custkey")
      t(s, dir, "orders")
        .join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    },

    // J6 — composite-natural-key group top-row (all versions of a package →
    // best part per (p_brand) under deterministic order)
    q("j6_group_top",
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn = 1 ORDER BY p_brand""") { (s, dir) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand")
    },

    // J7 — as-of join: first lineitem shipment strictly after the order date
    // (nearest_patched_package bisect semantics, utils.py:176-202)
    q("j7_asof_next",
      """SELECT o.o_orderkey, min(l.l_shipdate) AS next_ship
        |FROM orders o
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |               AND l.l_shipdate > o.o_orderdate
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate"))
        .groupBy(o("o_orderkey"))
        .agg(min("l_shipdate").as("next_ship"))
        .orderBy("o_orderkey")
    },

    // J8 — greater-than theta join inside an equi group (fixed.rank > affected.rank)
    q("j8_theta_gt",
      """SELECT p.p_partkey, count(*) AS n_above
        |FROM part p
        |JOIN lineitem l ON l.l_partkey = p.p_partkey
        |               AND l.l_extendedprice > p.p_retailprice
        |GROUP BY p.p_partkey ORDER BY p.p_partkey""") { (s, dir) =>
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") &&
          l("l_extendedprice") > p("p_retailprice"))
        .groupBy(p("p_partkey"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy("p_partkey")
    },

    // J9 — alias-consistency check: keys whose member rows disagree
    // ("all aliases must point to one vulnerability", import_runner.py:283-357)
    q("j9_consistency",
      """SELECT o_custkey, count(DISTINCT o_orderstatus) AS n_status
        |FROM orders GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderstatus) > 1 ORDER BY o_custkey""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(countDistinct("o_orderstatus").as("n_status"))
        .filter(col("n_status") > 1)
        .orderBy("o_custkey")
    },

    // J10 — enrichment join (KEV cveID → alias → vulnerability)
    q("j10_enrich",
      """SELECT c.c_custkey, count(*) AS event_cnt,
        |       round(sum(e.value), 2) AS total_value
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'error'
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""") { (s, dir) =>
      val e = t(s, dir, "events").filter(col("event_type") === "error")
      val c = t(s, dir, "customer")
      e.join(broadcast(c), e("user_id") === c("c_custkey"))
        .groupBy(c("c_custkey"))
        .agg(count(lit(1)).as("event_cnt"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("c_custkey")
    },

    // J11 — union of two equi-joins → distinct pairs (relate_severities)
    q("j11_union_joins",
      """SELECT DISTINCT id FROM (
        |  SELECT o.o_custkey AS id FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT e.user_id AS id FROM events e
        |  JOIN customer c ON e.user_id = c.c_custkey
        |) ORDER BY id""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val a = t(s, dir, "orders")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_custkey").as("id"))
      val b = t(s, dir, "events")
        .join(broadcast(c), col("user_id") === col("c_custkey"), "left_semi")
        .select(col("user_id").as("id"))
      a.union(b).distinct().orderBy("id")
    },

    // J12 — prefetch (join + group to nested child list), serialized as a
    // canonical sorted string so the oracle compare is format-stable
    q("j12_prefetch_nested",
      """SELECT o_custkey,
        |       string_agg(printf('%06d', o_orderkey), ',' ORDER BY o_orderkey)
        |         AS order_ids
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(
          array_sort(collect_list(format_string("%06d", col("o_orderkey")))),
          ",").as("order_ids"))
        .orderBy("o_custkey")
    },

    // J13 — bulk IN lookup (request purl list broadcast against packages)
    q("j13_bulk_in",
      """SELECT p.p_partkey, count(*) AS cnt
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_partkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
        |GROUP BY p.p_partkey ORDER BY p.p_partkey""") { (s, dir) =>
      val keys = Seq(1, 2, 3, 5, 8, 13, 21, 34, 55, 89).map(_.toLong)
      val p = t(s, dir, "part").filter(col("p_partkey").isin(keys: _*))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy("p_partkey")
    },

    // J14 — reference-prefix lookup (CPE-style): JSON prop extraction + join
    q("j14_ref_lookup",
      """SELECT e.event_type, count(*) AS cnt,
        |       CAST(sum(CAST(json_extract_string(e.props, '$.k') AS BIGINT))
        |            AS BIGINT) AS k_sum
        |FROM events e
        |WHERE e.user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |GROUP BY e.event_type ORDER BY e.event_type""") { (s, dir) =>
      val mach = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
      t(s, dir, "events")
        .join(broadcast(mach), col("user_id") === col("c_custkey"), "left_semi")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
        .orderBy("event_type")
    },

    // J15 — interval (range) join via bucket decomposition: events
    // counted into 1-3-hour attribution windows. The oracle runs the
    // naive theta join; the Spark side runs IntervalJoin.pointInInterval
    // (hour buckets → equi-join → exact containment filter), which is
    // the shape that survives 100 TB where the theta join plans as a
    // nested loop. LEFT-join semantics (zero-count windows kept) come
    // from joining the counts back to the interval set.
    q("j15_interval_count",
      """WITH i AS (SELECT event_id AS interval_id,
        |            CAST(ts AS TIMESTAMP) AS s,
        |            date_trunc('hour', CAST(ts AS TIMESTAMP))
        |              + ((event_id % 3) + 1) * INTERVAL 1 HOUR
        |              + INTERVAL 500 MILLISECOND AS e
        |           FROM events WHERE event_id % 500 = 0),
        |p AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT i.interval_id, count(p.event_id) AS cnt
        |FROM i LEFT JOIN p ON p.ts >= i.s AND p.ts < i.e
        |GROUP BY i.interval_id ORDER BY i.interval_id""") { (s, dir) =>
      val ev = t(s, dir, "events")
      // ends at hour-boundary + 0.5s: the truncated end second IS a
      // bucket boundary, so the fixture exercises the sub-second bucket
      // upper-bound edge (points in [trunc(e), e) must still match)
      val intervals = ev.filter(pmod(col("event_id"), lit(500)) === 0)
        .select(col("event_id").as("interval_id"), col("ts").as("s"),
          expr("date_trunc('hour', ts)" +
            " + (CAST(event_id % 3 AS INT) + 1) * INTERVAL '1' HOUR" +
            " + INTERVAL '0.5' SECOND").as("e"))
      val matched = IntervalJoin.pointInInterval(
        ev.select(col("event_id"), col("ts")),
        intervals, "ts", "s", "e", bucketSeconds = 3600L)
      val counts = matched.groupBy("interval_id")
        .agg(count(lit(1)).as("cnt"))
      intervals.select("interval_id")
        .join(counts, Seq("interval_id"), "left")
        .select(col("interval_id"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("interval_id")
    },
  )
}
