package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video are carried as `binary` columns with a metadata
  * struct; decode/feature-extraction runs as a batched partition-level
  * transform (`mapPartitions` here — the Scala analog of `mapInPandas`
  * batches). The decode itself is a STUB (no media libs in this
  * container): a deterministic fake that derives "features" from the
  * bytes; the Spark-side plumbing — schema, batching, partitioning — is
  * real and oracle-checked.
  */
object MultimodalQueries extends QueryModule {

  /** Typed row for the partition-level "decoder". */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, first_byte: Int,
      checksum: String, width: Int, height: Int)

  /** STUB decoder: deterministic fake media decode (real impl would call
    * an image/audio codec here). Width/height derive from the byte length
    * so the oracle can re-compute them. */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
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

  override val entries: Seq[QueryEntry] = Seq(
    // binary payload + partition-batched stub decode → typed metadata
    q("x_multimodal_decode",
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_bytes,
        |       ascii(substr(text, 1, 1)) AS first_byte,
        |       sha256(text) AS checksum,
        |       CAST(length(text) % 640 AS INT) AS width,
        |       CAST((length(text) // 640) % 480 AS INT) AS height
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      // documents.text is ASCII in the testdata, so utf-8 byte length ==
      // char length and the oracle can mirror every derived field
      val media: Dataset[MediaRow] = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRow]
      media.mapPartitions(decodePartition)
        .toDF()
        .orderBy("doc_id")
    },

    // multimodal partition layout: payload-size histogram per source
    // (the partitioning/batch-shape half of the pipeline)
    q("x_multimodal_stats",
      """SELECT source,
        |       count(*) AS n_items,
        |       CAST(min(length(text)) AS BIGINT) AS min_bytes,
        |       CAST(max(length(text)) AS BIGINT) AS max_bytes,
        |       CAST(sum(length(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source ORDER BY source""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), octet_length(encode(col("text"), "UTF-8"))
          .as("nb"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_items"),
          min("nb").cast("long").as("min_bytes"),
          max("nb").cast("long").as("max_bytes"),
          sum("nb").cast("long").as("total_bytes"))
        .orderBy("source")
    },
  )
}
