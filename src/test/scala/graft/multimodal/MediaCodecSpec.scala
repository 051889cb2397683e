package graft.multimodal

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The codec seam: the stub and a second, differently-behaved fake
  * implementation must both run through the identical partition-batched
  * plumbing — proving a real media library can drop in without touching
  * any Spark-side code. */
class MediaCodecSpec extends AnyFunSuite with SparkTestSession {

  /** Second fake: fixed 64×32 "thumbnails" whose checksum is the hex
    * byte count — shaped nothing like StubCodec on purpose. */
  private object FixedDimCodec extends MediaCodec {
    override def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
      rows.map { r =>
        MediaMeta(r.doc_id, r.payload.length.toLong,
          first_byte = -2, checksum = r.payload.length.toHexString,
          width = 64, height = 32)
      }
    override def resize(rows: Iterator[MediaMeta],
        target: Int): Iterator[ResizedMeta] =
      rows.map(m => ResizedMeta(m.doc_id, m.width, m.height,
        math.min(m.width, target), math.min(m.height, target)))
  }

  private def media: Dataset[MediaRow] = {
    val sp = spark
    import sp.implicits._
    Seq((1L, "abc"), (2L, "a" * 700), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  test("stub codec decodes deterministically through the seam") {
    val out = Multimodal.decode(media, StubCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).n_bytes == 3 && out(1L).first_byte == 'a'.toInt &&
      out(1L).width == 3 && out(1L).height == 0)
    assert(out(2L).width == 60 && out(2L).height == 1) // 700 = 640 + 60
    assert(out(3L).n_bytes == 0 && out(3L).first_byte == -1)
  }

  test("a second codec runs the SAME plumbing with its own semantics") {
    val out = Multimodal.decode(media, FixedDimCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // same rows, same batching
    assert(out(1L).width == 64 && out(1L).height == 32)
    assert(out(1L).checksum == "3" && out(2L).checksum == "2bc")
    val resized = Multimodal.decodeAndResize(media, 48, FixedDimCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(resized(1L).out_w == 48 && resized(1L).out_h == 32)
  }

  test("fused decode+resize matches staged decode then resize") {
    val fused = Multimodal.decodeAndResize(media, 256, StubCodec)
      .collect().sortBy(_.doc_id).toSeq
    val staged = StubCodec.resize(
      Multimodal.decode(media, StubCodec).collect().iterator, 256)
      .toSeq.sortBy(_.doc_id)
    assert(fused == staged)
  }
}
