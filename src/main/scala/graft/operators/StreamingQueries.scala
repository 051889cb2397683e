package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import graft.streaming.EventsStreaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — incremental/streaming mechanisms (T1–T4), exercised
  * in batch mode (unified API — same transforms run under readStream;
  * see EventsStreamingSpec for the streaming-mode run with watermarks).
  */
object StreamingQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  override val entries: Seq[QueryEntry] = Seq(
    // T1 — tumbling-window aggregation (the recurring-pipeline cadence)
    q("t1_window_agg",
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        |         AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""") { (s, dir) =>
      EventsStreaming.windowedCounts(t(s, dir, "events"))
        .orderBy("ws", "event_type")
    },

    // T2 — checkpoint-watermark incremental export selection
    q("t2_watermark_export",
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03' ORDER BY event_id""") { (s, dir) =>
      EventsStreaming.changedSince(t(s, dir, "events"), "2024-01-03")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // T4 — import-once pending queue (anti-join vs processed marker set)
    q("t4_pending_queue",
      """SELECT e.event_id, e.event_type FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM events p
        |                  WHERE p.event_id = e.event_id
        |                    AND p.event_id % 3 = 0)
        |ORDER BY e.event_id""") { (s, dir) =>
      val processed = t(s, dir, "events")
        .filter(pmod(col("event_id"), lit(3)) === 0)
        .select("event_id")
      EventsStreaming.pendingQueue(t(s, dir, "events"), processed)
        .select("event_id", "event_type")
        .orderBy("event_id")
    },
  )
}
