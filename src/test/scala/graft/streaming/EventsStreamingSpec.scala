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
}
