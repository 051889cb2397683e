package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{MediaRow, Multimodal, StubCodec}

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video are carried as `binary` columns with a metadata
  * struct; decode/feature-extraction runs as a batched partition-level
  * transform (`mapPartitions` — the Scala analog of `mapInPandas`
  * batches) behind the [[graft.multimodal.MediaCodec]] seam. The codec
  * used here is the deterministic [[StubCodec]] (no media libs in this
  * container); the Spark-side plumbing — schema, batching,
  * partitioning — is real and oracle-checked, and a real codec drops
  * into the same seam (MediaCodecSpec proves a second implementation
  * runs the identical plumbing).
  */
object MultimodalQueries extends QueryModule {

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
      Multimodal.decode(media, StubCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // stub resize chained onto the stub decode in ONE partition pass
    // (decode → feature transform without re-batching — the shape a
    // mapInPandas pipeline composes)
    q("x_multimodal_resize",
      """SELECT doc_id, width, height,
        |       CASE WHEN greatest(width, height) <= 0 THEN 0
        |            WHEN greatest(width, height) <= 256 THEN width
        |            ELSE CAST(width * 256 // greatest(width, height) AS INT)
        |       END AS out_w,
        |       CASE WHEN greatest(width, height) <= 0 THEN 0
        |            WHEN greatest(width, height) <= 256 THEN height
        |            ELSE CAST(height * 256 // greatest(width, height) AS INT)
        |       END AS out_h
        |FROM (SELECT doc_id,
        |             CAST(length(text) % 640 AS INT) AS width,
        |             CAST((length(text) // 640) % 480 AS INT) AS height
        |      FROM documents)
        |ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      val media: Dataset[MediaRow] = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRow]
      Multimodal.decodeAndResize(media, 256, StubCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // frame sampling: the payload as an n_bytes/64-frame "video",
    // every 8th frame index emitted — declarative sequence+explode, so
    // Catalyst runs it codegen'd with no partition transform at all
    q("x_multimodal_framesample",
      """SELECT doc_id, CAST(unnest(range(0, n_frames, 8)) AS BIGINT)
        |         AS frame_idx
        |FROM (SELECT doc_id, length(text) // 64 AS n_frames
        |      FROM documents)
        |WHERE n_frames > 0
        |ORDER BY doc_id, frame_idx""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr("octet_length(encode(text, 'UTF-8')) div 64")
            .cast("long").as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(8L)))
            .as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
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
