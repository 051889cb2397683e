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

  private def png(w: Int, h: Int): Array[Byte] =
    ImageIoCodec.synthesizePng(w, h)

  test("ImageIoCodec really decodes PNG dimensions through the seam") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, png(320, 200)),
      (2L, png(5, 400)),
      (3L, Array[Byte](1, 2, 3)), // not an image
      (4L, Array.empty[Byte]))
      .toDF("doc_id", "payload").as[MediaRow]
    val out = Multimodal.decode(rows, ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 320 && out(1L).height == 200)
    assert(out(2L).width == 5 && out(2L).height == 400)
    // PNG magic byte really came from the encoder, not a fake
    assert(out(1L).first_byte == 0x89)
    // corrupt/empty payloads cost one row, not a task failure
    assert(out(3L).width == -1 && out(3L).height == -1)
    assert(out(4L).width == -1 && out(4L).first_byte == -1)
    // raw-byte checksum (NOT the stub's UTF-8 reinterpretation)
    assert(out(3L).checksum ==
      graft.functions.CanonicalJson.sha256HexBytes(Array[Byte](1, 2, 3)))

    val resized = Multimodal.decodeAndResize(rows, 100, ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(resized(1L).out_w == 100 && resized(1L).out_h == 62)
    assert(resized(2L).out_w == 1 && resized(2L).out_h == 100)
  }

  test("ImageIoCodec pixel resample emits a real PNG at fit geometry") {
    val thumb = ImageIoCodec.resampleToPng(png(320, 200), 100)
    assert(thumb.isDefined)
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumb.get))
    assert(re.getWidth == 100 && re.getHeight == 62)
    // small-enough images pass through at original geometry
    val same = ImageIoCodec.resampleToPng(png(40, 30), 100)
    val reSame = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(same.get))
    assert(reSame.getWidth == 40 && reSame.getHeight == 30)
    assert(ImageIoCodec.resampleToPng(Array[Byte](9, 9), 100).isEmpty)
  }

  test("AudioSystemCodec really decodes WAV frames/rate/peak through the seam") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, AudioSystemCodec.synthesizeWav(300, 1, 8000)),
      (2L, AudioSystemCodec.synthesizeWav(250, 2, 16000)),
      (3L, AudioSystemCodec.synthesizeWav(1, 1, 8000)), // shortest clip
      (4L, Array[Byte](1, 2, 3)), // not audio
      (5L, Array.empty[Byte]))
      .toDF("doc_id", "payload").as[MediaRow]
    val out = Multimodal.decodeAudio(rows, AudioSystemCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).frames == 300 && out(1L).channels == 1 &&
      out(1L).sample_rate == 8000 && out(1L).duration_ms == 37)
    // canonical RIFF/WAVE header is exactly 44 bytes before the PCM data
    assert(out(1L).n_bytes == 44 + 300 * 1 * 2)
    assert(out(2L).frames == 250 && out(2L).channels == 2 &&
      out(2L).n_bytes == 44 + 250 * 2 * 2)
    // sawtooth peak |s| = 1000 for ANY frames >= 1: s(0) = -1000
    assert(out(1L).peak_abs == 1000 && out(2L).peak_abs == 1000 &&
      out(3L).peak_abs == 1000)
    // corrupt/empty payloads cost one degraded row, not a task failure
    assert(out(4L).frames == -1 && out(4L).channels == -1 &&
      out(4L).sample_rate == -1 && out(4L).peak_abs == -1)
    assert(out(5L).frames == -1 && out(5L).n_bytes == 0)
  }

  test("decodable non-16-bit audio reports peak -1, not silent 0") {
    // 8-bit unsigned PCM WAV: decodable (frames/rate real) but peak is
    // "not computed" — the -1 sentinel, distinguishable from silence
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val data = Array.fill[Byte](100)(0x80.toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = AudioSystemCodec.decode(
      Iterator(MediaRow(1L, bos.toByteArray))).toSeq.head
    assert(out.frames == 100 && out.sample_rate == 8000)
    assert(out.peak_abs == -1)
    // a genuinely SILENT 16-bit clip stays 0 — the two are distinct
    val silent16 = {
      val f16 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val a = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](200)), f16, 100L)
      val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        a, javax.sound.sampled.AudioFileFormat.Type.WAVE, b)
      b.toByteArray
    }
    assert(AudioSystemCodec.decode(
      Iterator(MediaRow(2L, silent16))).toSeq.head.peak_abs == 0)
  }

  test("audio resample picks real decoded samples at floor arithmetic") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, AudioSystemCodec.synthesizeWav(400, 1, 16000)), // downsample
      (2L, AudioSystemCodec.synthesizeWav(100, 2, 8000)),  // upsample
      (3L, Array[Byte](7, 7, 7)))                          // corrupt
      .toDF("doc_id", "payload").as[MediaRow]
    val out = Multimodal.resampleAudio(rows, 12000, AudioSystemCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).out_frames == 400L * 12000 / 16000 && // 300
      out(1L).out_rate == 12000 && out(1L).out_peak == 1000)
    assert(out(2L).out_frames == 150 && out(2L).frames == 100 &&
      out(2L).sample_rate == 8000 && out(2L).out_peak == 1000)
    assert(out(3L).frames == -1 && out(3L).out_frames == -1 &&
      out(3L).out_rate == 12000 && out(3L).out_peak == -1)
    // non-positive target rate degrades instead of emitting garbage
    val bad = AudioSystemCodec.resample(
      Iterator(MediaRow(9L, AudioSystemCodec.synthesizeWav(50, 1, 8000))), 0)
      .toSeq.head
    assert(bad.out_frames == -1 && bad.out_peak == -1)
  }

  test("MjpegAviCodec really parses the AVI container and decodes frames") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, MjpegAviCodec.synthesizeAvi(5, 32, 24, 25)),
      (2L, MjpegAviCodec.synthesizeAvi(2, 16, 12, 10)),
      (3L, MjpegAviCodec.synthesizeAvi(0, 20, 20, 50)), // header-only clip
      (4L, Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0)), // truncated RIFF
      (5L, Array[Byte](1, 2, 3)))                        // not a video
      .toDF("doc_id", "payload").as[MediaRow]
    val out = Multimodal.decodeVideo(rows, MjpegAviCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).frames == 5 && out(1L).decoded_frames == 5 &&
      out(1L).width == 32 && out(1L).height == 24 &&
      out(1L).fps == 25 && out(1L).duration_ms == 200)
    assert(out(2L).frames == 2 && out(2L).decoded_frames == 2 &&
      out(2L).fps == 10 && out(2L).duration_ms == 200)
    assert(out(3L).frames == 0 && out(3L).decoded_frames == 0 &&
      out(3L).width == 20 && out(3L).duration_ms == 0)
    // corrupt/truncated payloads cost one degraded row each
    assert(out(4L).frames == -1 && out(4L).width == -1 && out(4L).fps == -1)
    assert(out(5L).frames == -1 && out(5L).decoded_frames == -1)
  }

  test("a crafted near-2^31 chunk size degrades the row, not the task") {
    // RIFF/'AVI ' magic + one chunk claiming 0x7FFFFFE0 bytes: signed-Int
    // offset arithmetic would wrap negative, slip the bounds check, and
    // throw out of fourcc — killing the partition instead of the row
    val evil = new java.io.ByteArrayOutputStream()
    evil.write("RIFF".getBytes("US-ASCII"))
    evil.write(Array[Byte](0x20, 0, 0, 0))
    evil.write("AVI ".getBytes("US-ASCII"))
    evil.write("LIST".getBytes("US-ASCII"))
    evil.write(Array[Byte](0xE0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F)) // 2^31-32
    evil.write(new Array[Byte](32))
    val out = MjpegAviCodec.decode(
      Iterator(MediaRow(1L, evil.toByteArray))).toSeq.head
    assert(out.frames == -1 && out.decoded_frames == -1 && out.width == -1)
    // and an unsigned size past 2^31 (reads negative as Int) likewise
    val evil2 = evil.toByteArray.clone()
    evil2(15) = 0xFF.toByte // size fourcc -> 0xFFFFFFE0 = u32 4294967264
    val out2 = MjpegAviCodec.decode(
      Iterator(MediaRow(2L, evil2))).toSeq.head
    assert(out2.frames == -1)
  }

  test("MJPEG frames carry real pixel data through the lossy cycle") {
    val avi = MjpegAviCodec.synthesizeAvi(3, 48, 32, 20)
    (0 until 3).foreach { i =>
      val img = MjpegAviCodec.decodeFrame(avi, i)
      assert(img.isDefined && img.get.getWidth == 48 && img.get.getHeight == 32)
      // solid-color frames survive JPEG quantization within a small
      // tolerance; matching the per-frame fill proves pixels decoded
      val rgb = img.get.getRGB(24, 16)
      val (er, eg, eb) = MjpegAviCodec.frameColor(i)
      assert(math.abs(((rgb >> 16) & 0xff) - er) <= 8, s"frame $i red")
      assert(math.abs(((rgb >> 8) & 0xff) - eg) <= 8, s"frame $i green")
      assert(math.abs((rgb & 0xff) - eb) <= 8, s"frame $i blue")
    }
    assert(MjpegAviCodec.decodeFrame(avi, 3).isEmpty) // out of range
  }

  test("frame sampling decodes every k-th frame at bounded cost") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, MjpegAviCodec.synthesizeAvi(7, 24, 16, 25)), // ceil(7/2) = 4
      (2L, MjpegAviCodec.synthesizeAvi(4, 24, 16, 25)), // ceil(4/2) = 2
      (3L, Array[Byte](0, 1)))
      .toDF("doc_id", "payload").as[MediaRow]
    val out = Multimodal.sampleVideoFrames(rows, 2, MjpegAviCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).frames == 7 && out(1L).decoded_frames == 4)
    assert(out(2L).frames == 4 && out(2L).decoded_frames == 2)
    assert(out(3L).frames == -1 && out(3L).decoded_frames == -1)
    // stride 1 degenerates to full decode
    val full = MjpegAviCodec.sampleFrames(
      Iterator(MediaRow(9L, MjpegAviCodec.synthesizeAvi(3, 16, 12, 10))), 1)
      .toSeq.head
    assert(full.decoded_frames == 3)
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
