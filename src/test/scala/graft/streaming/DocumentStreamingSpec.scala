package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

final case class DocArrival(doc_id: Long, text: String, lang: String,
    arrived_at: Timestamp)

/** Streaming document dedup/profile under a real readStream with
  * watermarked state (the training-data intake path). */
class DocumentStreamingSpec extends AnyFunSuite with SparkTestSession {

  private def doc(id: Long, text: String, t: String, lang: String = "en") =
    DocArrival(id, text, lang, Timestamp.valueOf(t))

  test("dedupArrivals drops in-horizon duplicate content, keeps first") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[DocArrival]
    val query = DocumentStreaming.dedupArrivals(mem.toDF())
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        doc(1, "the quick brown fox", "2024-01-01 00:00:00"),
        doc(2, "a different document", "2024-01-01 00:01:00"))
      query.processAllAvailable()
      // same content again (normalized: case/whitespace) in a later
      // micro-batch, still inside the watermark horizon -> dropped
      mem.addData(
        doc(3, "  The QUICK brown fox ", "2024-01-01 00:10:00"),
        doc(4, "yet another document", "2024-01-01 00:12:00"))
      query.processAllAvailable()
      val ids = sp.sql("SELECT doc_id FROM doc_dedup ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 4L))
    } finally query.stop()
  }

  test("arrivalProfile closes windowed language counts") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[DocArrival]
    val query = DocumentStreaming.arrivalProfile(mem.toDF())
      .writeStream.format("memory").queryName("doc_profile")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        doc(1, "abcd", "2024-01-01 00:10:00"),
        doc(2, "abcdefgh", "2024-01-01 00:20:00"),
        doc(3, "quatre", "2024-01-01 00:30:00", lang = "fr"))
      query.processAllAvailable()
      mem.addData(doc(9, "late", "2024-01-01 06:00:00")) // close windows
      query.processAllAvailable()
      val rows = sp.sql(
        """SELECT lang, n_docs, mean_len FROM doc_profile
          |WHERE ws = TIMESTAMP '2024-01-01 00:00:00'
          |ORDER BY lang""".stripMargin).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("en", 2L, 6.0), ("fr", 1L, 6.0)))
    } finally query.stop()
  }
}
