package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioSystemCodec, ImageIoCodec, MediaRow, MjpegAviCodec, Multimodal, StubCodec}

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video are carried as `binary` columns with a metadata
  * struct; decode/feature-extraction runs as a batched partition-level
  * transform (`mapPartitions` — the Scala analog of `mapInPandas`
  * batches) behind the [[graft.multimodal.MediaCodec]] seam. Two codecs
  * ride it: the deterministic [[StubCodec]] for rows whose every field
  * the DuckDB oracle must rebuild bit-for-bit, and [[ImageIoCodec]] —
  * REAL pixel decode via the JDK's javax.imageio, no external library —
  * exercised end-to-end by x_multimodal_decode_real, whose oracle
  * predicts the encode→decode round-tripped dimensions. Audio rides the
  * sibling [[graft.multimodal.AudioCodec]] seam with
  * [[AudioSystemCodec]] — REAL WAV/PCM decode via the JDK's
  * javax.sound.sampled, exercised by x_multimodal_audio_real /
  * x_multimodal_audio_resample. Video rides the [[graft.multimodal
  * .VideoCodec]] seam with [[MjpegAviCodec]] — REAL Motion-JPEG/AVI
  * decode (RIFF container parse + per-frame javax.imageio), exercised
  * by x_multimodal_video_real / x_multimodal_video_sample. No media
  * kind is stub-only anymore.
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

    // REAL image decode end-to-end (no stub): each doc gets a genuine
    // PNG synthesized at doc_id-derived dimensions, and ImageIoCodec —
    // the JDK javax.imageio path — decodes actual pixels through the
    // same partition-batched seam. The oracle predicts the dimensions
    // arithmetically: they only match if the decoder really parsed the
    // image (PNG magic 0x89 = 137 likewise comes off the wire bytes).
    q("x_multimodal_decode_real",
      """SELECT doc_id,
        |       CAST(16 + doc_id % 32 AS INT) AS width,
        |       CAST(8 + doc_id % 16 AS INT) AS height,
        |       CAST(137 AS INT) AS first_byte,
        |       TRUE AS decoded
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      val dims = Tables(s, dir, "documents")
        .select(col("doc_id"),
          (lit(16) + pmod(col("doc_id"), lit(32))).cast("int").as("w"),
          (lit(8) + pmod(col("doc_id"), lit(16))).cast("int").as("h"))
        .as[(Long, Int, Int)]
      val media: Dataset[MediaRow] = dims.mapPartitions(_.map {
        case (id, w, h) => MediaRow(id, ImageIoCodec.synthesizePng(w, h))
      })
      Multimodal.decode(media, ImageIoCodec)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("first_byte"), (col("n_bytes") > 0).as("decoded"))
        .orderBy("doc_id")
    },

    // REAL audio decode end-to-end: each doc (except every 7th, which
    // carries its raw text bytes as a deliberately-corrupt payload) gets
    // a genuine RIFF/WAVE PCM-16 file synthesized at doc_id-derived
    // (frames, channels, rate), and AudioSystemCodec — the JDK
    // javax.sound.sampled path — decodes actual samples through the
    // partition-batched seam. Every output field is arithmetic in the
    // row key: n_bytes = 44-byte canonical header + frames·channels·2
    // PCM bytes (verified against AudioSystem.write), frames/channels/
    // rate survive the encode→decode cycle, peak_abs = 1000 because the
    // sawtooth's s(0) = −1000 (samples really parsed, not header math),
    // and corrupt payloads degrade to the −1 sentinel row.
    q("x_multimodal_audio_real",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(length(text) AS BIGINT)
        |            ELSE CAST(44 + (100 + doc_id % 400) * (1 + doc_id % 2) * 2 AS BIGINT)
        |       END AS n_bytes,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(100 + doc_id % 400 AS BIGINT) END AS frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(8000 + (doc_id % 3) * 4000 AS INT) END AS sample_rate,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST((100 + doc_id % 400) * 1000
        |                      // (8000 + (doc_id % 3) * 4000) AS BIGINT)
        |       END AS duration_ms,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(1000 AS INT) END AS peak_abs
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      // fan the small scan out BEFORE the compute-heavy codec pass: a
      // few row groups would otherwise serialize synth+decode on 1-2
      // cores (the 10x rehearsal showed ~21x wall at 10x data without it)
      val keyed = graft.core.FanOut(Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("txt")))
        .as[(Long, Array[Byte])]
      val media: Dataset[MediaRow] = keyed.mapPartitions(_.map {
        case (id, txt) =>
          if (id % 7 == 0) MediaRow(id, txt) // not a WAV → degraded row
          else MediaRow(id, AudioSystemCodec.synthesizeWav(
            (100 + id % 400).toInt, (1 + id % 2).toInt,
            (8000 + (id % 3) * 4000).toInt))
      })
      Multimodal.decodeAudio(media, AudioSystemCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // audio resample through the same seam: nearest-neighbor to a fixed
    // 12 kHz. out_frames = floor(frames·target/src) is pure arithmetic;
    // out_peak = 1000 because output frame 0 always reads source frame
    // 0 (the −1000 sample) — only true if resampling really indexed the
    // decoded PCM. Corrupt payloads keep the −1 sentinel shape with the
    // requested out_rate echoed.
    q("x_multimodal_audio_resample",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(100 + doc_id % 400 AS BIGINT) END AS frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(8000 + (doc_id % 3) * 4000 AS INT) END AS sample_rate,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST((100 + doc_id % 400) * 12000
        |                      // (8000 + (doc_id % 3) * 4000) AS BIGINT)
        |       END AS out_frames,
        |       CAST(12000 AS INT) AS out_rate,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(1000 AS INT) END AS out_peak
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      val keyed = graft.core.FanOut(Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("txt")))
        .as[(Long, Array[Byte])]
      val media: Dataset[MediaRow] = keyed.mapPartitions(_.map {
        case (id, txt) =>
          if (id % 7 == 0) MediaRow(id, txt)
          else MediaRow(id, AudioSystemCodec.synthesizeWav(
            (100 + id % 400).toInt, (1 + id % 2).toInt,
            (8000 + (id % 3) * 4000).toInt))
      })
      Multimodal.resampleAudio(media, 12000, AudioSystemCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // REAL video decode end-to-end: each doc (except every 7th,
    // deliberately corrupt) gets a genuine MJPEG AVI — RIFF container +
    // per-frame JPEGs — synthesized at doc_id-derived (frames, w, h,
    // fps), and MjpegAviCodec parses the container and decodes EVERY
    // frame through javax.imageio. decoded_frames == frames only if
    // each JPEG actually parsed at the header geometry; fps round-trips
    // through dwMicroSecPerFrame (all four fps choices divide 1e6);
    // duration_ms = frames*1000/fps in integer math. With this, image,
    // audio AND video are all genuinely decoded — no stub-only media
    // kind remains.
    q("x_multimodal_video_real",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(2 + doc_id % 6 AS BIGINT) END AS frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(2 + doc_id % 6 AS BIGINT) END AS decoded_frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(16 + doc_id % 16 AS INT) END AS width,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(12 + doc_id % 12 AS INT) END AS height,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            WHEN doc_id % 4 = 0 THEN 10 WHEN doc_id % 4 = 1 THEN 20
        |            WHEN doc_id % 4 = 2 THEN 25 ELSE 50 END AS fps,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST((2 + doc_id % 6) * 1000
        |                      // (CASE WHEN doc_id % 4 = 0 THEN 10
        |                              WHEN doc_id % 4 = 1 THEN 20
        |                              WHEN doc_id % 4 = 2 THEN 25
        |                              ELSE 50 END) AS BIGINT)
        |       END AS duration_ms
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      val media: Dataset[MediaRow] = videoMedia(s, dir)
      Multimodal.decodeVideo(media, MjpegAviCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // frame SAMPLING through the same container: decode only every 2nd
    // frame (indices 0, 2, 4, …), so decoded_frames = ceil(frames/2) —
    // the bounded-cost shape a clip-level feature extractor runs at
    // 100 TB, where decoding every frame of every video is the budget
    // killer. Header fields still come from the full container parse.
    q("x_multimodal_video_sample",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(2 + doc_id % 6 AS BIGINT) END AS frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST((2 + doc_id % 6 + 1) // 2 AS BIGINT)
        |       END AS decoded_frames,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(16 + doc_id % 16 AS INT) END AS width,
        |       CASE WHEN doc_id % 7 = 0 THEN CAST(-1 AS INT)
        |            ELSE CAST(12 + doc_id % 12 AS INT) END AS height
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      val spark = s
      import spark.implicits._
      val media: Dataset[MediaRow] = videoMedia(s, dir)
      Multimodal.sampleVideoFrames(media, 2, MjpegAviCodec)
        .toDF()
        .select(col("doc_id"), col("frames"), col("decoded_frames"),
          col("width"), col("height"))
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

  /** Shared fixture stage for the video queries: fan the small doc scan
    * out (synth+decode would otherwise serialize on the few parquet row
    * groups), then attach a doc_id-keyed MJPEG AVI per row — every 7th
    * doc carries its raw text bytes as a deliberately-corrupt payload,
    * mirroring the audio fixture convention.
    *
    * Synthesis is memoized per partition: every AVI parameter is a
    * function of doc_id mod {6, 16, 12, 4}, all divisors of 48, so at
    * most 48 DISTINCT payloads exist and re-encoding ~5 JPEG frames per
    * row would spend ~2× the decode being measured on building
    * byte-identical fixtures. The DECODE still runs per row on real
    * container bytes — memoization only stops the fixture generator from
    * dominating the engine stage it feeds (at 100 TB the payloads come
    * from storage; synthesis is test scaffolding, not engine cost). */
  private def videoMedia(s: SparkSession, dir: String): Dataset[MediaRow] = {
    val spark = s
    import spark.implicits._
    val keyed = graft.core.FanOut(Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("txt")))
      .as[(Long, Array[Byte])]
    keyed.mapPartitions { it =>
      val memo = new java.util.HashMap[Int, Array[Byte]](64)
      it.map { case (id, txt) =>
        if (id % 7 == 0) MediaRow(id, txt) // not RIFF/AVI → degraded row
        else {
          val key = (id % 48).toInt
          var avi = memo.get(key)
          if (avi == null) {
            val fps = (id % 4) match {
              case 0 => 10; case 1 => 20; case 2 => 25; case _ => 50
            }
            avi = MjpegAviCodec.synthesizeAvi(
              (2 + id % 6).toInt, (16 + id % 16).toInt,
              (12 + id % 12).toInt, fps)
            memo.put(key, avi)
          }
          MediaRow(id, avi)
        }
      }
    }
  }
}
