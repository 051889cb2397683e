package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("containment boundaries, bucket spans, and empty intervals") {
    val sp = spark
    import sp.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: in (inclusive)
      (2L, ts("2024-01-01 11:59:59")), // inside, last second
      (3L, ts("2024-01-01 12:00:00")), // == end: out (exclusive)
      (4L, ts("2024-01-01 10:59:59")), // bucket 10, interval spans 10-11
      (5L, ts("2024-01-02 10:30:00"))  // different day entirely
    ).toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (200L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00")) // empty
    ).toDF("iid", "s", "e")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "s", "e", bucketSeconds = 3600L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (4L, 100L)))
  }

  test("sub-second bounds: boundary-second points kept, == end excluded") {
    val sp = spark
    import sp.implicits._
    // unix_timestamp truncates fractions, so an end of 12:00:00.5 with
    // hourly buckets used to cap the interval's bucket range at 11:00 —
    // every point in [12:00:00, 12:00:00.5) silently dropped; and the
    // all-sub-second interval used to walk sequence() backwards.
    val points = Seq(
      (1L, ts("2024-01-01 12:00:00.3")), // in [s,e) of both intervals
      (2L, ts("2024-01-01 12:00:00.5")), // == e of 100: out
      (3L, ts("2024-01-01 12:00:00.7")), // past both ends
      (4L, ts("2024-01-01 12:00:00.1"))  // in both intervals
    ).toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00.5")),
      (200L, ts("2024-01-01 12:00:00.05"), ts("2024-01-01 12:00:00.45"))
    ).toDF("iid", "s", "e")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "s", "e", bucketSeconds = 3600L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (4L, 100L), (1L, 200L), (4L, 200L)))
  }

  test("bucketed result equals the naive theta join") {
    val sp = spark
    import sp.implicits._
    val points = (0 until 500)
      .map(i => (i.toLong, new Timestamp(1704067200000L + i * 137000L)))
      .toDF("pid", "ts")
    val intervals = (0 until 40).map { i =>
      val s = 1704067200000L + i * 1733000L
      (i.toLong, new Timestamp(s), new Timestamp(s + (1 + i % 4) * 3600000L))
    }.toDF("iid", "s", "e")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "s", "e", bucketSeconds = 1800L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = points.join(intervals,
        col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }
}
