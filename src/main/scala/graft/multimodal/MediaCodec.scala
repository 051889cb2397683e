package graft.multimodal

import org.apache.spark.sql.Dataset

/** Typed rows crossing the codec seam. */
final case class MediaRow(doc_id: Long, payload: Array[Byte])
final case class MediaMeta(doc_id: Long, n_bytes: Long, first_byte: Int,
    checksum: String, width: Int, height: Int)
final case class ResizedMeta(doc_id: Long, width: Int, height: Int,
    out_w: Int, out_h: Int)

/** The pluggable decode seam for multimodal columns.
  *
  * The engine treats image/audio/video as opaque `binary` columns and
  * runs decode/feature-extraction as batched partition-level transforms
  * (`mapPartitions` — the Scala analog of a `mapInPandas` batch). The
  * CODEC is the only non-Spark ingredient, so it lives behind this
  * trait: a real implementation wraps an image/audio library's
  * per-partition native handle (expensive to open — once per partition,
  * never per row, which is exactly what the Iterator→Iterator shape
  * guarantees); this container has no media libraries, so the shipped
  * implementation is [[StubCodec]], a deterministic fake over the raw
  * bytes that keeps every Spark-side contract (schema, batching,
  * partitioning) real and oracle-checkable.
  *
  * Implementations must be Serializable: the codec object ships inside
  * the task closure to every executor.
  */
trait MediaCodec extends Serializable {

  /** Decode one partition batch of payloads into typed metadata. */
  def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta]

  /** Resize one partition batch. The default is the shared
    * aspect-preserving fit ([[MediaCodec.aspectFit]]) so decode-only
    * codecs can't drift from each other's geometry policy; override
    * only for genuinely different resize semantics. */
  def resize(rows: Iterator[MediaMeta], target: Int): Iterator[ResizedMeta] =
    rows.map(MediaCodec.aspectFit(_, target))
}

object MediaCodec {

  /** Aspect-preserving fit of (width, height) into a `target`-pixel
    * box: the ONE geometry policy every codec shares (floor division;
    * degenerate dims pass through as 0×0). */
  def aspectFit(m: MediaMeta, target: Int): ResizedMeta = {
    val mx = math.max(m.width, m.height)
    if (mx <= 0) ResizedMeta(m.doc_id, m.width, m.height, 0, 0)
    else if (mx <= target)
      ResizedMeta(m.doc_id, m.width, m.height, m.width, m.height)
    else ResizedMeta(m.doc_id, m.width, m.height,
      (m.width.toLong * target / mx).toInt,
      (m.height.toLong * target / mx).toInt)
  }
}

/** Deterministic fake codec: "decodes" width/height from the byte
  * length and checksums the payload, in pure integer math so the
  * DuckDB oracle reproduces every field bit-for-bit. */
object StubCodec extends MediaCodec {

  override def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        first_byte = if (n > 0) r.payload(0) & 0xff else -1,
        checksum = graft.functions.CanonicalJson.sha256Hex(
          new String(r.payload, "UTF-8")),
        width = (n % 640).toInt,
        height = ((n / 640) % 480).toInt)
    }
}

/** REAL image codec over the JDK's built-in `javax.imageio` — no
  * external library needed, so the decode seam is no longer
  * environment-blocked for images (PNG/JPEG/BMP/GIF ship with every
  * Java 17 runtime; audio/video stay stubbed). Width/height come from
  * actual pixel decode; the checksum is sha-256 over the RAW payload
  * bytes (StubCodec hashes a UTF-8 reinterpretation — fine for a fake,
  * lossy for real binaries). Undecodable or empty payloads degrade to
  * width = height = -1 instead of failing the partition: at 100 TB a
  * corrupt member must cost one row, not a task retry storm.
  *
  * ImageIO's static readers are thread-safe for independent streams, so
  * one shared object serves all 32 local cores; `ImageIO.setUseCache
  * (false)` keeps decode purely in-memory (the default spills a temp
  * file per image — a disk write per ROW on the executor hot path).
  */
object ImageIoCodec extends MediaCodec {

  override def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
    // per-partition, not per-row: flip the temp-file cache off once
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { r =>
      val n = r.payload.length.toLong
      // NonFatal, not just IOException: JDK plugins throw unchecked
      // exceptions (IndexOutOfBounds, IllegalArgument, NegativeArraySize)
      // on payloads whose magic passes but whose body is malformed — any
      // of those escaping here would fail the task, not the row
      val img =
        if (n == 0) null
        else
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        first_byte = if (n > 0) r.payload(0) & 0xff else -1,
        checksum = graft.functions.CanonicalJson.sha256HexBytes(r.payload),
        width = if (img == null) -1 else img.getWidth,
        height = if (img == null) -1 else img.getHeight)
    }
  }

  /** A deterministic w×h gradient PNG (no RNG): the synthetic payload
    * generator for decode round-trip checks — dimensions survive the
    * encode→decode cycle, so an oracle that predicts (w, h) from the
    * row key verifies the decoder really parsed pixels. */
  def synthesizePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 7 + y * 13) % 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pixel-level resample (bilinear) to the aspect-fit box, re-encoded
    * as PNG — the payload-in/payload-out stage a thumbnailing pipeline
    * runs. Not wired to an oracled query (DuckDB cannot re-decode
    * pixels); spec-verified against known geometry. */
  def resampleToPng(payload: Array[Byte], target: Int): Option[Array[Byte]] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0) None
    else {
      val mx = math.max(img.getWidth, img.getHeight)
      val (w, h) =
        if (mx <= target) (img.getWidth, img.getHeight)
        else ((img.getWidth.toLong * target / mx).toInt.max(1),
          (img.getHeight.toLong * target / mx).toInt.max(1))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }
}

/** Typed rows for the AUDIO half of the seam: frame/channel/rate stats
  * instead of pixel geometry. */
final case class AudioMeta(doc_id: Long, n_bytes: Long, frames: Long,
    channels: Int, sample_rate: Int, duration_ms: Long, peak_abs: Int)
final case class ResampledAudio(doc_id: Long, frames: Long,
    sample_rate: Int, out_frames: Long, out_rate: Int, out_peak: Int)

/** Audio decode seam — same contract as [[MediaCodec]] (Serializable,
  * Iterator→Iterator partition batches, corrupt payload costs one row)
  * but with audio-shaped metadata. Kept as a sibling trait rather than
  * overloading MediaMeta's width/height: the schema crossing the seam
  * IS the contract, and pretending frames are pixels would leak the
  * stub era into the real one. */
trait AudioCodec extends Serializable {
  def decode(rows: Iterator[MediaRow]): Iterator[AudioMeta]
  def resample(rows: Iterator[MediaRow], targetRate: Int): Iterator[ResampledAudio]
}

/** REAL audio codec over the JDK's built-in `javax.sound.sampled` — no
  * external library needed (WAV/AU/AIFF PCM parsers ship with every
  * Java 17 runtime), so audio joins images as genuinely decoded and
  * only VIDEO remains stub-with-seam (the JDK has no video codec).
  *
  * `frames` is counted from the PCM bytes actually drained through
  * `readAllBytes` (not the header's declared length), `peak_abs` is the
  * max |sample| over every decoded 16-bit frame honoring the format's
  * endianness — both only match an arithmetic oracle if the decoder
  * really parsed the sample data. Undecodable payloads degrade to -1s
  * instead of failing the partition (one bad row, not a retry storm).
  */
object AudioSystemCodec extends AudioCodec {

  /** The audio SPI providers, resolved ONCE per JVM.
    *
    * `AudioSystem.getAudioInputStream`/`write` re-run the provider
    * lookup on EVERY call, and under Spark that lookup walks the
    * executor classloader's full ServiceLoader scan — hundreds of jars —
    * per ROW: a thread-dump of the 10× bench showed the hot path parked
    * in `JDK13Services.getProviders`, costing ~10× the actual decode
    * work. Resolving the `javax.sound.sampled.spi` readers/writers once
    * (public SPI API, same classes AudioSystem itself dispatches to) and
    * calling them directly turns the per-row cost back into pure parse
    * arithmetic. Lazy + per-JVM: each executor pays one classpath scan.
    */
  /** (non-MIDI readers, MIDI readers). The JDK's SoftMidiAudioFileReader
    * delegates to `MidiSystem.getSequence`, which runs its OWN provider
    * scan per call — so probing it on non-MIDI bytes costs a classpath
    * walk per ROW (the second thing the 10× thread-dump caught). It is
    * only consulted when the payload actually carries the MIDI magic. */
  @transient private lazy val fileReaders
      : (List[javax.sound.sampled.spi.AudioFileReader],
         List[javax.sound.sampled.spi.AudioFileReader]) = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result().partition(!_.getClass.getName.contains("Midi"))
  }

  private def isMidi(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'M' && payload(1) == 'T' &&
      payload(2) == 'h' && payload(3) == 'd'
  @transient private lazy val fileWriters
      : List[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Parse + drain one payload: (format, interleaved PCM bytes). */
  private def readPcm(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] = {
    val (plain, midi) = fileReaders
    val readers = if (isMidi(payload)) plain ++ midi else plain
    var rs = readers
    while (rs.nonEmpty) {
      try {
        val ais = rs.head.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try return Some((ais.getFormat, ais.readAllBytes()))
        finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => () }
      rs = rs.tail
    }
    // provider-less environment (exotic classloader): AudioSystem's own
    // dispatch still works, just slower — correctness over speed
    if (readers.isEmpty) {
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try Some((ais.getFormat, ais.readAllBytes()))
        finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    } else None
  }

  /** Signed 16-bit sample at byte offset `off`, either endianness. */
  private def sample16(bytes: Array[Byte], off: Int, bigEndian: Boolean): Int =
    if (bigEndian) ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort.toInt
    else ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt

  override def decode(rows: Iterator[MediaRow]): Iterator[AudioMeta] =
    rows.map { r =>
      val n = r.payload.length.toLong
      readPcm(r.payload) match {
        case Some((fmt, bytes)) if fmt.getFrameSize > 0 =>
          val frames = bytes.length.toLong / fmt.getFrameSize
          // peak is only computed for 16-bit PCM; other decodable widths
          // (8-bit WAV, mu-law AU) report the -1 "not computed" sentinel —
          // the degraded-row convention everywhere else — so genuinely
          // silent 16-bit audio (peak 0) stays distinguishable
          var peak = if (fmt.getSampleSizeInBits == 16) 0 else -1
          if (fmt.getSampleSizeInBits == 16) {
            var off = 0
            while (off + 1 < bytes.length) {
              val a = math.abs(sample16(bytes, off, fmt.isBigEndian))
              if (a > peak) peak = a
              off += 2
            }
          }
          val rate = math.round(fmt.getSampleRate)
          AudioMeta(r.doc_id, n, frames, fmt.getChannels, rate,
            if (rate > 0) frames * 1000L / rate else -1L, peak)
        case _ => AudioMeta(r.doc_id, n, -1L, -1, -1, -1L, -1)
      }
    }

  /** Nearest-neighbor resample to `targetRate`: output frame j reads
    * source frame floor(j·srcRate/targetRate). The arithmetic output
    * length (frames·target/src, floor) is what an oracle predicts; the
    * peak over the RESAMPLED frames proves samples were really picked
    * from decoded data, not recomputed from the header. */
  override def resample(rows: Iterator[MediaRow],
      targetRate: Int): Iterator[ResampledAudio] =
    rows.map { r =>
      readPcm(r.payload) match {
        case Some((fmt, bytes))
            if targetRate > 0 && fmt.getFrameSize > 0 &&
              fmt.getSampleSizeInBits == 16 &&
              math.round(fmt.getSampleRate) > 0 =>
          val frameSize = fmt.getFrameSize
          val srcRate = math.round(fmt.getSampleRate)
          val frames = bytes.length.toLong / frameSize
          val outFrames = frames * targetRate / srcRate
          var peak = 0
          var j = 0L
          while (j < outFrames) {
            val src = (j * srcRate / targetRate).toInt
            var off = src * frameSize
            val end = math.min(off + frameSize, bytes.length - 1)
            while (off + 1 <= end) {
              val a = math.abs(sample16(bytes, off, fmt.isBigEndian))
              if (a > peak) peak = a
              off += 2
            }
            j += 1
          }
          ResampledAudio(r.doc_id, frames, srcRate, outFrames, targetRate, peak)
        case _ =>
          ResampledAudio(r.doc_id, -1L, -1, -1L, targetRate, -1)
      }
    }

  /** A deterministic PCM-16 WAV (no RNG): `frames` frames of the
    * sawtooth s(i) = ((i mod 200) − 100)·10 on every channel, written
    * through `AudioSystem.write` so the payload is a REAL RIFF/WAVE
    * file. Peak |s| = 1000 whenever frames ≥ 1 (the −1000 sample is
    * s(0), at i = 0; the positive extreme s(199) = 990 never beats it),
    * and the frame count
    * survives the encode→decode cycle — so an oracle predicting
    * (frames, channels, rate, peak) from the row key verifies the
    * decoder really parsed both header and samples. */
  def synthesizeWav(frames: Int, channels: Int, rateHz: Int): Array[Byte] = {
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames) {
      val s = (((i % 200) - 100) * 10).toShort
      var c = 0
      while (c < channels) {
        val off = (i * channels + c) * 2
        data(off) = (s & 0xff).toByte
        data(off + 1) = ((s.toInt >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rateHz.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    fileWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos) // no per-call provider scan
      case None    => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
    }
    bos.toByteArray
  }
}

/** Typed rows for the VIDEO third of the seam: container-level frame
  * accounting plus per-frame decode verification. `frames` is the
  * container header's declared count; `decoded_frames` counts frames
  * whose image payload ACTUALLY decoded (and matched the container's
  * declared geometry) — the two only agree when the codec parsed every
  * frame, which is what an arithmetic oracle checks. */
final case class VideoMeta(doc_id: Long, frames: Long, decoded_frames: Long,
    width: Int, height: Int, fps: Int, duration_ms: Long)

/** Video decode seam — same contract as [[MediaCodec]]/[[AudioCodec]]
  * (Serializable, Iterator→Iterator partition batches, corrupt payload
  * costs one row, never the partition). `sampleFrames(every = k)` is the
  * frame-sampling stage of a training-data pipeline: it decodes only
  * every k-th frame, so the per-row cost is bounded by the sample rate,
  * not the clip length. */
trait VideoCodec extends Serializable {
  def decode(rows: Iterator[MediaRow]): Iterator[VideoMeta]
  def sampleFrames(rows: Iterator[MediaRow], every: Int): Iterator[VideoMeta]
}

/** REAL video codec for Motion-JPEG in an AVI/RIFF container — pure
  * JDK, no external library: the container is plain RIFF chunk walking
  * (fourcc + little-endian u32 size, even-byte padding — the public
  * Microsoft "AVI RIFF File Reference" layout), and every frame chunk
  * (`??dc`/`??db`) is a standalone JPEG that `javax.imageio` decodes.
  * With this, all three media kinds on the seam are genuinely decoded
  * end-to-end; nothing in the multimodal surface is stub-only anymore.
  *
  * What makes the decode REAL and oracle-checkable:
  *   - `width`/`height`/`frames`/`fps` come from the parsed `avih`
  *     header (fps = 1e6 / dwMicroSecPerFrame);
  *   - `decoded_frames` increments only when a movi frame chunk's bytes
  *     decode through ImageIO AND the decoded pixel geometry equals the
  *     header geometry — header math alone cannot produce it;
  *   - a payload that is not RIFF/AVI (or is truncated mid-chunk)
  *     degrades to the −1 sentinel row, the convention shared with the
  *     image and audio codecs.
  */
object MjpegAviCodec extends VideoCodec {

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
      (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parsed container: avih fields + (offset, length) of each frame
    * chunk's payload, in stream order. */
  private final case class Avi(usPerFrame: Long, totalFrames: Long,
      width: Int, height: Int, frameChunks: Vector[(Int, Int)])

  private def parseAvi(b: Array[Byte]): Option[Avi] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    var usPerFrame = -1L
    var total = -1L
    var w = -1
    var h = -1
    val chunks = Vector.newBuilder[(Int, Int)]
    var truncated = false
    // chunk sizes are UNSIGNED u32 off the wire: all offset arithmetic in
    // Long, or a crafted size near 2^31 wraps Int-negative, slips past the
    // bounds check, and a corrupt payload kills the TASK instead of
    // degrading to its one sentinel row
    def walk(start: Int, end: Int): Unit = {
      var o = start.toLong
      while (o + 8 <= end && !truncated) {
        val oi = o.toInt
        val id = fourcc(b, oi)
        val sz = u32(b, oi + 4)
        val body = o + 8
        if (body + sz > b.length) { truncated = true; return }
        val bodyI = body.toInt
        val szI = sz.toInt
        id match {
          case "LIST" if sz >= 4 => walk(bodyI + 4, bodyI + szI)
          case "avih" if sz >= 40 =>
            usPerFrame = u32(b, bodyI)
            total = u32(b, bodyI + 16)
            w = u32(b, bodyI + 32).toInt
            h = u32(b, bodyI + 36).toInt
          case s if s.endsWith("dc") || s.endsWith("db") =>
            chunks += ((bodyI, szI))
          case _ => ()
        }
        o = body + sz + (sz & 1) // RIFF chunks pad to even offsets
      }
    }
    walk(12, b.length)
    if (truncated || usPerFrame <= 0 || w <= 0 || h <= 0) None
    else Some(Avi(usPerFrame, total, w, h, chunks.result()))
  }

  /** A reusable per-partition JPEG reader. `ImageIO.read` re-probes the
    * SPI registry and allocates a fresh reader + stream wrapper per
    * CALL — measurable lock/alloc contention when 32 cores decode five
    * tiny frames per row. MJPEG frames are JPEG by definition, so one
    * reader per partition with `setInput` per frame (the documented
    * ImageIO reuse pattern) keeps the hot loop allocation-free; anything
    * the reader rejects falls back to the generic path and then to the
    * degraded row. */
  private def newJpegReader(): javax.imageio.ImageReader = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
    if (it.hasNext) it.next() else null
  }

  /** Decode one frame chunk; true iff it is a parseable image of the
    * container's declared geometry. The stream wrapper is closed per
    * frame (it buffers the bytes it reads; leaving it to GC retains one
    * buffer per frame across the partition). */
  private def frameDecodes(reader: javax.imageio.ImageReader,
      b: Array[Byte], off: Int, len: Int, w: Int, h: Int): Boolean = {
    val img =
      if (reader != null) {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b, off, len))
        try {
          reader.setInput(iis, true, true)
          reader.read(0)
        } catch { case scala.util.control.NonFatal(_) => null }
        finally {
          try iis.close()
          catch { case scala.util.control.NonFatal(_) => () }
        }
      } else {
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b, off, len))
        catch { case scala.util.control.NonFatal(_) => null }
      }
    img != null && img.getWidth == w && img.getHeight == h
  }

  /** Run `f` over the partition with a per-partition reusable reader,
    * disposing it (native JPEG decoder state) when the rows run dry. */
  private def withReader[T](rows: Iterator[MediaRow])(
      f: (javax.imageio.ImageReader, MediaRow) => T): Iterator[T] = {
    val reader = newJpegReader()
    new Iterator[T] {
      private var disposed = false
      override def hasNext: Boolean = {
        val h = rows.hasNext
        if (!h && reader != null && !disposed) {
          disposed = true
          try reader.dispose()
          catch { case scala.util.control.NonFatal(_) => () }
        }
        h
      }
      override def next(): T = f(reader, rows.next())
    }
  }

  private def meta(docId: Long, avi: Avi, decoded: Long): VideoMeta = {
    val fps = math.round(1e6 / avi.usPerFrame).toInt
    VideoMeta(docId, avi.totalFrames, decoded, avi.width, avi.height, fps,
      if (fps > 0) avi.totalFrames * 1000L / fps else -1L)
  }

  private val Degraded = (id: Long) => VideoMeta(id, -1L, -1L, -1, -1, -1, -1L)

  override def decode(rows: Iterator[MediaRow]): Iterator[VideoMeta] = {
    javax.imageio.ImageIO.setUseCache(false) // once per partition
    withReader(rows) { (reader, r) => // one reader per partition, not per frame
      parseAvi(r.payload) match {
        case Some(avi) =>
          var ok = 0L
          avi.frameChunks.foreach { case (off, len) =>
            if (frameDecodes(reader, r.payload, off, len, avi.width,
                avi.height))
              ok += 1
          }
          meta(r.doc_id, avi, ok)
        case None => Degraded(r.doc_id)
      }
    }
  }

  override def sampleFrames(rows: Iterator[MediaRow],
      every: Int): Iterator[VideoMeta] = {
    require(every >= 1, "frame sample stride must be >= 1")
    javax.imageio.ImageIO.setUseCache(false)
    withReader(rows) { (reader, r) =>
      parseAvi(r.payload) match {
        case Some(avi) =>
          var ok = 0L
          var i = 0
          while (i < avi.frameChunks.size) {
            val (off, len) = avi.frameChunks(i)
            if (frameDecodes(reader, r.payload, off, len, avi.width,
                avi.height))
              ok += 1
            i += every
          }
          meta(r.doc_id, avi, ok)
        case None => Degraded(r.doc_id)
      }
    }
  }

  // --- synthesis (the deterministic fixture generator) ---

  private def putU32(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }
  private def putFourcc(bos: java.io.ByteArrayOutputStream, s: String): Unit =
    bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(body.length + 12)
    putFourcc(bos, id); putU32(bos, body.length.toLong); bos.write(body)
    if ((body.length & 1) == 1) bos.write(0) // pad to even
    bos.toByteArray
  }
  private def list(tpe: String, bodies: Array[Byte]*): Array[Byte] = {
    val sz = 4 + bodies.map(_.length).sum
    val bos = new java.io.ByteArrayOutputStream(sz + 8)
    putFourcc(bos, "LIST"); putU32(bos, sz.toLong); putFourcc(bos, tpe)
    bodies.foreach(bos.write)
    bos.toByteArray
  }

  /** The deterministic per-frame fill: frame i is the solid color
    * (20 + 37·i mod 200, 20 + 59·i mod 200, 20 + 83·i mod 200) — flat
    * JPEG blocks survive lossy encode within a small tolerance, which
    * the spec asserts to prove pixel data (not just headers) decodes. */
  def frameColor(i: Int): (Int, Int, Int) =
    (20 + (37 * i) % 200, 20 + (59 * i) % 200, 20 + (83 * i) % 200)

  private def jpegFrame(w: Int, h: Int, i: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (cr, cg, cb) = frameColor(i)
    val rgb = (cr << 16) | (cg << 8) | cb
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A deterministic MJPEG AVI (no RNG): `frames` solid-color JPEG
    * frames at w×h, `fps` from {10, 20, 25, 50}-style divisors of 1e6
    * so dwMicroSecPerFrame round-trips exactly. The header fields and
    * frame count survive the encode→decode cycle, so an oracle
    * predicting (frames, decoded_frames, w, h, fps, duration) from the
    * row key verifies the decoder parsed both container and frames. */
  def synthesizeAvi(frames: Int, w: Int, h: Int, fps: Int): Array[Byte] = {
    require(frames >= 0 && w > 0 && h > 0 && fps > 0 && 1000000 % fps == 0,
      "fps must divide 1e6 for an exact usPerFrame round-trip")
    val avih = {
      val bos = new java.io.ByteArrayOutputStream(56)
      putU32(bos, (1000000 / fps).toLong) // dwMicroSecPerFrame
      putU32(bos, 0L); putU32(bos, 0L); putU32(bos, 0L)
      putU32(bos, frames.toLong) // dwTotalFrames
      putU32(bos, 0L); putU32(bos, 1L); putU32(bos, 0L) // 1 stream
      putU32(bos, w.toLong); putU32(bos, h.toLong)
      (0 until 4).foreach(_ => putU32(bos, 0L)) // dwReserved
      bos.toByteArray
    }
    val strh = {
      val bos = new java.io.ByteArrayOutputStream(56)
      putFourcc(bos, "vids"); putFourcc(bos, "MJPG")
      putU32(bos, 0L); putU32(bos, 0L); putU32(bos, 0L) // flags, prio/lang, init
      putU32(bos, 1L); putU32(bos, fps.toLong) // dwScale, dwRate
      putU32(bos, 0L); putU32(bos, frames.toLong) // start, dwLength
      putU32(bos, 0L); putU32(bos, 0L); putU32(bos, 0L) // buf, quality, sampleSize
      putU32(bos, (w.toLong << 16)); putU32(bos, (h.toLong << 16)) // rcFrame
      bos.toByteArray
    }
    val strf = {
      val bos = new java.io.ByteArrayOutputStream(40)
      putU32(bos, 40L); putU32(bos, w.toLong); putU32(bos, h.toLong)
      putU32(bos, (24L << 16) | 1L) // planes = 1, bitCount = 24
      putFourcc(bos, "MJPG"); putU32(bos, (w.toLong * h * 3))
      putU32(bos, 0L); putU32(bos, 0L); putU32(bos, 0L); putU32(bos, 0L)
      bos.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi",
      (0 until frames).map(i => chunk("00dc", jpegFrame(w, h, i))): _*)
    val riffBody = {
      val bos = new java.io.ByteArrayOutputStream()
      putFourcc(bos, "AVI "); bos.write(hdrl); bos.write(movi)
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream(riffBody.length + 8)
    putFourcc(out, "RIFF"); putU32(out, riffBody.length.toLong)
    out.write(riffBody)
    out.toByteArray
  }

  /** Decode the i-th frame's pixels (spec hook: proves pixel data, not
    * just headers, survives the cycle). */
  def decodeFrame(payload: Array[Byte], i: Int)
      : Option[java.awt.image.BufferedImage] =
    parseAvi(payload).flatMap { avi =>
      avi.frameChunks.lift(i).flatMap { case (off, len) =>
        Option(
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, off, len))
          catch { case scala.util.control.NonFatal(_) => null })
      }
    }
}

/** The codec-independent pipeline stages: any [[MediaCodec]] drops into
  * the same partition-batched plumbing. */
object Multimodal {

  def decode(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    media.mapPartitions(codec.decode)
  }

  /** Decode → resize fused in ONE partition pass (no re-batching between
    * stages — the shape a mapInPandas pipeline composes). */
  def decodeAndResize(media: Dataset[MediaRow], target: Int,
      codec: MediaCodec = StubCodec): Dataset[ResizedMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ResizedMeta]
    media.mapPartitions(rows => codec.resize(codec.decode(rows), target))
  }

  /** Audio half of the seam: same partition-batched plumbing, audio-shaped
    * metadata. Any [[AudioCodec]] drops in. */
  def decodeAudio(media: Dataset[MediaRow],
      codec: AudioCodec = AudioSystemCodec): Dataset[AudioMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioMeta]
    media.mapPartitions(codec.decode)
  }

  def resampleAudio(media: Dataset[MediaRow], targetRate: Int,
      codec: AudioCodec = AudioSystemCodec): Dataset[ResampledAudio] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ResampledAudio]
    media.mapPartitions(rows => codec.resample(rows, targetRate))
  }

  /** Video third of the seam: same partition-batched plumbing,
    * container-shaped metadata. Any [[VideoCodec]] drops in. */
  def decodeVideo(media: Dataset[MediaRow],
      codec: VideoCodec = MjpegAviCodec): Dataset[VideoMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[VideoMeta]
    media.mapPartitions(codec.decode)
  }

  def sampleVideoFrames(media: Dataset[MediaRow], every: Int,
      codec: VideoCodec = MjpegAviCodec): Dataset[VideoMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[VideoMeta]
    media.mapPartitions(rows => codec.sampleFrames(rows, every))
  }
}
