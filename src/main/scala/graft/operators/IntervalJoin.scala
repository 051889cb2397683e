package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale.
  *
  * Catalyst plans a raw `ts >= start AND ts < end` join as a broadcast
  * nested loop — O(points × intervals) comparisons, the join shape that
  * dies first at 100 TB (time-window attribution, IP-range lookups,
  * validity-interval joins all hit it). The scale form decomposes time
  * into fixed buckets: each interval explodes to the buckets it spans,
  * each point maps to ONE bucket, and the join becomes an equi-join on
  * the bucket key followed by the exact containment filter. Candidate
  * volume drops from |P|×|I| to sum over buckets of |P_b|×|I_b| — and
  * every operator in the plan is a plain hash/sort-merge equi-join that
  * AQE can size, salt, and skew-split like any other.
  *
  * Bucket size tunes the fan-out/selectivity trade: ~the median interval
  * length is a good default (an interval then explodes to ~2 rows). No
  * dedup is needed: a point lives in exactly one bucket, so each
  * (point, interval) pair meets at most once.
  */
object IntervalJoin {

  /** Inner join of `points` (event rows with `tsCol`) to `intervals`
    * (rows with `[startCol, endCol)` — end exclusive) on containment.
    * Empty/negative intervals are dropped (they contain nothing, and
    * `sequence()` would otherwise walk backwards).
    *
    * The interval's bucket range upper bound is floor(end/bucket)
    * UNCONDITIONALLY — not floor((end-1)/bucket). unix_timestamp
    * truncates sub-second precision, so with a fractional end (e.g.
    * 12:00:00.5, hourly buckets) the minus-one form skips the bucket
    * holding points in [trunc(end), end), silently dropping matches;
    * it also let a sub-second interval walk sequence(x, x-1) backwards.
    * The cost is at most one extra candidate bucket per interval, which
    * the exact containment filter removes. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be >= 1")
    val pB = points.withColumn("_ib",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    val iB = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_ib", explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    pB.join(iB, Seq("_ib"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_ib")
  }
}
