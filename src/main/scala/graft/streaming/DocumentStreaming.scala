package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms for document (training-data) arrival —
  * the streaming forms of the x_* dedup/analysis family, written against
  * the unified API so the same code runs incremental-batch or
  * `readStream`.
  */
object DocumentStreaming {

  /** Streaming exact dedup on arrival (the streaming form of D1 /
    * x_dedup_exact): the first arrival of each normalized content hash
    * survives; duplicate deliveries within the watermark horizon are
    * dropped. `dropDuplicatesWithinWatermark` bounds the state store to
    * the distinct hashes seen inside the horizon — state ∝ arrival rate
    * × horizon, NOT corpus size, which is what makes this shape viable
    * on an unbounded 100 TB ingest. A re-delivery after state eviction
    * passes through again — downstream storage dedups idempotently via
    * the same content_id (the batch D1 path).
    */
  def dedupArrivals(docs: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_id", sha2(lower(trim(col("text"))), 256))
      .withWatermark("arrived_at", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_id")

  /** Per-window language/quality profile of the arrival stream (the
    * monitoring mart a training-data intake runs): windowed counts and
    * mean document length per detected language bucket. */
  def arrivalProfile(docs: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .withWatermark("arrived_at", watermarkDelay)
      .groupBy(window(col("arrived_at"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 2).as("mean_len"))
      .select(col("window.start").as("ws"), col("lang"),
        col("n_docs"), col("mean_len"))
}
