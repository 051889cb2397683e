package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Runs the SAME transform used by the batch gate (t1_window_agg) as a
  * true Structured Streaming query with watermark state. */
class EventsStreamingSpec extends AnyFunSuite with SparkTestSession {

  private def ev(id: Long, t: String, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), id % 5, typ, v, "{}")

  test("windowedCounts under readStream with watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Ev]
    val query = EventsStreaming.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        ev(1, "2024-01-01 00:10:00", "click", 10.0),
        ev(2, "2024-01-01 00:40:00", "click", 5.0),
        ev(3, "2024-01-01 01:10:00", "error", 2.0))
      query.processAllAvailable()
      // advance event time far enough to close the first windows
      mem.addData(ev(4, "2024-01-01 06:00:00", "click", 1.0))
      query.processAllAvailable()
      val rows = sp.sql(
        """SELECT ws, event_type, cnt, value_sum FROM win_counts
          |ORDER BY ws, event_type""".stripMargin).collect()
      val closed = rows.map(r =>
        (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3)))
      assert(closed.contains(("2024-01-01 00:00:00.0", "click", 2L, 15.0)))
      assert(closed.contains(("2024-01-01 01:00:00.0", "error", 1L, 2.0)))
    } finally query.stop()
  }

  test("late rows beyond the watermark are dropped") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Ev]
    val query = EventsStreaming.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("late_counts")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, "2024-01-01 00:10:00", "click", 10.0))
      query.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 09:00:00", "click", 1.0)) // advances wm
      query.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 00:20:00", "click", 99.0)) // too late
      query.processAllAvailable()
      val first = sp.sql(
        """SELECT cnt, value_sum FROM late_counts
          |WHERE ws = TIMESTAMP '2024-01-01 00:00:00'""".stripMargin).collect()
      // the 00:00 window closed before the late row arrived — it holds
      // only the on-time event
      assert(first.map(r => (r.getLong(0), r.getDouble(1))).toSeq
        == Seq((1L, 10.0)))
    } finally query.stop()
  }

  test("sessionize merges within-gap events and closes via watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Ev]
    val query = EventsStreaming.sessionize(mem.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then one 40 min
      // later (a new session); user 2: one event
      mem.addData(
        Ev(10, Timestamp.valueOf("2024-01-01 00:00:00"), 1, "c", 1.0, "{}"),
        Ev(11, Timestamp.valueOf("2024-01-01 00:10:00"), 1, "c", 2.0, "{}"),
        Ev(12, Timestamp.valueOf("2024-01-01 00:50:00"), 1, "c", 4.0, "{}"),
        Ev(13, Timestamp.valueOf("2024-01-01 00:05:00"), 2, "c", 8.0, "{}"))
      query.processAllAvailable()
      // advance the watermark far enough to close everything
      mem.addData(
        Ev(99, Timestamp.valueOf("2024-01-01 09:00:00"), 3, "c", 0.0, "{}"))
      query.processAllAvailable()
      val rows = sp.sql(
        """SELECT user_id, session_start, n_events, value_sum
          |FROM sessions ORDER BY user_id, session_start""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3)))
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", 2L, 3.0)))
      assert(rows.contains((1L, "2024-01-01 00:50:00.0", 1L, 4.0)))
      assert(rows.contains((2L, "2024-01-01 00:05:00.0", 1L, 8.0)))
    } finally query.stop()
  }
}

/** flatMapGroupsWithState maintenance of the latest pointer: import on
  * first sight, update on strictly newer versions, silence on stale or
  * duplicate re-delivery — the streaming form of W2 + T5. */
class AdvisoryStreamingSpec extends AnyFunSuite with SparkTestSession {

  private def ave(avid: String, cid: String, t: String) =
    AdvisoryVersionEvent(avid, cid, Timestamp.valueOf(t))

  test("latest pointer emits import/update and drops stale arrivals") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[AdvisoryVersionEvent]
    val query = AdvisoryStreaming.latestChanges(sp, mem.toDS())
      .writeStream.format("memory").queryName("adv_changes")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ave("pypa/P-1", "c1", "2024-01-01 00:00:00"))
      query.processAllAvailable()
      mem.addData(
        ave("pypa/P-1", "c2", "2024-02-01 00:00:00"), // newer -> update
        ave("pypa/P-1", "c0", "2023-12-01 00:00:00"), // stale -> dropped
        ave("ghsa/G-1", "g1", "2024-01-05 00:00:00")) // new avid -> import
      query.processAllAvailable()
      mem.addData(ave("pypa/P-1", "c2", "2024-02-01 00:00:00")) // dup
      query.processAllAvailable()
      val rows = sp.sql(
        """SELECT avid, action_type, unique_content_id FROM adv_changes
          |ORDER BY action_time, avid""".stripMargin).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      assert(rows == Seq(
        ("pypa/P-1", "import", "c1"),
        ("ghsa/G-1", "import", "g1"),
        ("pypa/P-1", "update", "c2")))
    } finally query.stop()
  }

  test("multi-version micro-batch collapses in batch-window order") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[AdvisoryVersionEvent]
    val query = AdvisoryStreaming.latestChanges(sp, mem.toDS())
      .writeStream.format("memory").queryName("adv_changes2")
      .outputMode(OutputMode.Append).start()
    try {
      // one batch delivers three versions out of order
      mem.addData(
        ave("deb/D-1", "c2", "2024-02-01 00:00:00"),
        ave("deb/D-1", "c1", "2024-01-01 00:00:00"),
        ave("deb/D-1", "c3", "2024-03-01 00:00:00"))
      query.processAllAvailable()
      val rows = sp.sql(
        "SELECT action_type, unique_content_id FROM adv_changes2 " +
          "ORDER BY action_time").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      // ordered within the batch: oldest imports, each newer updates
      assert(rows == Seq(("import", "c1"), ("update", "c2"),
        ("update", "c3")))
    } finally query.stop()
  }
}
