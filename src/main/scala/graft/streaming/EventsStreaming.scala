package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms for the events stream.
  *
  * The reference is micro-batch (RQ scheduler + watermark checkpoints,
  * SURVEY §2.10); these transforms use Spark's unified batch/streaming
  * API so the SAME code runs as an incremental batch (driver cadence) or
  * a true `readStream` with `Trigger.AvailableNow` — the 100 TB path is a
  * streaming ingest with watermarked state eviction.
  */
object EventsStreaming {

  /** Tumbling-window counts + value sums per event type. With a streaming
    * source, the 2-hour watermark bounds state (late rows beyond it are
    * dropped); in batch mode the watermark is a no-op. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
          .as("value_sum"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("value_sum"))

  /** Gap-based sessionization: per-user `session_window` — consecutive
    * events merge while each arrives strictly before the previous
    * event's time + gap (Spark's session end is exclusive, so a gap of
    * exactly `gap` starts a new session). The session state is
    * per-user-per-open-session and merges map-side; with a streaming
    * source the watermark closes sessions whose end passed it — state
    * is bounded by ACTIVE sessions, not history, which is what makes
    * per-user sessionization viable on an unbounded event stream. In
    * batch mode (the oracle path) the watermark is a no-op. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
          .as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("value_sum"))

  /** Incremental-export selection: rows past the checkpoint watermark
    * (pipes/export.py:58-76). */
  def changedSince(events: DataFrame, checkpoint: String): DataFrame =
    events.filter(col("ts") >= to_timestamp(lit(checkpoint)))

  /** Import-once queue: rows not yet marked processed (date_imported is
    * null semantics, pipelines/__init__.py:231-248). */
  def pendingQueue(events: DataFrame, processed: DataFrame): DataFrame =
    events.join(processed, Seq("event_id"), "left_anti")
}
