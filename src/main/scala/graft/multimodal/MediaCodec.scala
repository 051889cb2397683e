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

  /** Resize one partition batch (aspect-preserving fit into a
    * `target`-pixel box). */
  def resize(rows: Iterator[MediaMeta], target: Int): Iterator[ResizedMeta]
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

  override def resize(rows: Iterator[MediaMeta],
      target: Int): Iterator[ResizedMeta] =
    rows.map { m =>
      val mx = math.max(m.width, m.height)
      if (mx <= 0) ResizedMeta(m.doc_id, m.width, m.height, 0, 0)
      else if (mx <= target)
        ResizedMeta(m.doc_id, m.width, m.height, m.width, m.height)
      else ResizedMeta(m.doc_id, m.width, m.height,
        (m.width.toLong * target / mx).toInt,
        (m.height.toLong * target / mx).toInt)
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
}
