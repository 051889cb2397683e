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

    // T3 — re-unfurl staleness selection through the REAL derive function
    // (unfurl_version_range.py:201-212): synthetic impacts carry a
    // nullable unfurl watermark; never-attempted rows (null) first, then
    // those at/below the cutoff
    // Gap-based sessionization (session_window): the oracle re-derives
    // sessions with the lag/flag/cumulative-sum idiom — a new session
    // when the gap REACHES 30 min (>=), matching Spark's exclusive
    // session end. Timestamps cast ns→us on both sides (Tables already
    // floors to micros; the oracle casts TIMESTAMP_NS to TIMESTAMP).
    q("t8_sessionize",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |m AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        |         AS value_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""") { (s, dir) =>
      EventsStreaming.sessionize(t(s, dir, "events"))
        .orderBy("user_id", "session_start")
    },

    q("t3_stale_impacts",
      """SELECT avid, base_purl, last_range_unfurl_at FROM (
        |  SELECT 'adv/' || CAST(o_orderkey % 40 AS VARCHAR) AS avid,
        |         'pkg:npm/p' || CAST(o_custkey % 15 AS VARCHAR) AS base_purl,
        |         CASE WHEN o_orderkey % 5 <> 0 THEN o_orderdate END
        |           AS last_range_unfurl_at
        |  FROM orders)
        |WHERE last_range_unfurl_at IS NULL
        |   OR last_range_unfurl_at <= TIMESTAMP '1997-01-01'
        |ORDER BY last_range_unfurl_at NULLS FIRST, avid, base_purl""") {
      (s, dir) =>
      val impacts = t(s, dir, "orders").select(
        concat(lit("adv/"), pmod(col("o_orderkey"), lit(40))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("o_custkey"), lit(15)))
          .as("base_purl"),
        when(pmod(col("o_orderkey"), lit(5)) =!= 0, col("o_orderdate"))
          .as("last_range_unfurl_at"))
      graft.derive.AdvisoryDerive.staleImpacts(impacts,
          java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
        .orderBy(asc_nulls_first("last_range_unfurl_at"), col("avid"),
          col("base_purl"))
    },

    // T-family: all-impacts-unfurled marking
    // (mark_unfurl_version_range.py:79-124) — per-advisory
    // attempted/successful conjunctions as one partial-aggregatable
    // groupBy (min over booleans = the reference's NOT EXISTS probes)
    q("t7_unfurl_marks",
      """SELECT avid, bool_and(att IS NOT NULL) AS all_attempted,
        |       bool_and(att IS NOT NULL AND succ IS NOT NULL)
        |         AS all_successful
        |FROM (
        |  SELECT 'adv/' || CAST(o_orderkey % 40 AS VARCHAR) AS avid,
        |         CASE WHEN o_orderkey % 5 <> 0 THEN o_orderdate END AS att,
        |         CASE WHEN o_orderkey % 5 <> 0 AND o_orderkey % 3 <> 0
        |              THEN o_orderdate END AS succ
        |  FROM orders)
        |GROUP BY avid ORDER BY avid""") { (s, dir) =>
      val impacts = t(s, dir, "orders").select(
        concat(lit("adv/"), pmod(col("o_orderkey"), lit(40))).as("avid"),
        when(pmod(col("o_orderkey"), lit(5)) =!= 0, col("o_orderdate"))
          .as("last_range_unfurl_at"),
        when(pmod(col("o_orderkey"), lit(5)) =!= 0 &&
          pmod(col("o_orderkey"), lit(3)) =!= 0, col("o_orderdate"))
          .as("last_successful_range_unfurl_at"))
      graft.derive.AdvisoryDerive.allImpactsUnfurled(impacts)
        .orderBy("avid")
    },

    // T5 — append-only change log through the REAL derive function
    // (ChangeLog models.py:1530-1717): first collected version of an
    // avid is an 'import' event, every later one an 'update', ordered by
    // the (date_collected, content-id) total order
    q("t5_changelog",
      """SELECT avid, action_time, action_type, source_url, actor FROM (
        |  SELECT 'adv/' || CAST(o_orderkey % 50 AS VARCHAR) AS avid,
        |         o_orderdate AS action_time,
        |         CASE WHEN row_number() OVER (
        |                PARTITION BY o_orderkey % 50
        |                ORDER BY o_orderdate,
        |                         md5(CAST(o_orderkey AS VARCHAR))) = 1
        |              THEN 'import' ELSE 'update' END AS action_type,
        |         'https://src.example/' || CAST(o_orderkey % 50 AS VARCHAR)
        |           AS source_url,
        |         'graft' AS actor
        |  FROM orders)
        |ORDER BY avid, action_time, action_type""") { (s, dir) =>
      val advisories = t(s, dir, "orders").select(
        concat(lit("adv/"), pmod(col("o_orderkey"), lit(50))).as("avid"),
        col("o_orderdate").as("date_collected"),
        md5(col("o_orderkey").cast("string")).as("unique_content_id"),
        concat(lit("https://src.example/"), pmod(col("o_orderkey"), lit(50)))
          .as("url"))
      graft.derive.AdvisoryDerive.changeLog(advisories)
        .orderBy("avid", "action_time", "action_type")
    },

    // T5b — PackageChangeLog (models.py:1648-1717): one idempotent
    // AFFECTED_BY / FIXING entry per (package version, advisory)
    // relation, actor = the advisory's datasource
    q("t5b_package_changelog",
      """WITH u AS (
        |  SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
        |         'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR)
        |           AS base_purl,
        |         CAST(l_linenumber AS VARCHAR) AS version,
        |         l_quantity > 25 AS is_affected,
        |         l_quantity <= 25 AS is_fixed
        |  FROM lineitem),
        |acts AS (
        |  SELECT DISTINCT avid, base_purl, version,
        |         'AFFECTED_BY' AS action_type FROM u WHERE is_affected
        |  UNION
        |  SELECT DISTINCT avid, base_purl, version, 'FIXING'
        |  FROM u WHERE is_fixed)
        |SELECT base_purl || '@' || version AS purl, action_type, avid,
        |       'ds' || CAST(CAST(substring(avid, 5) AS INT) % 3
        |                    AS VARCHAR) AS actor,
        |       'https://src/' || avid AS source_url
        |FROM acts ORDER BY purl, action_type, avid""") { (s, dir) =>
      val unfurled = t(s, dir, "lineitem").select(
        concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
        concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
          .as("base_purl"),
        col("l_linenumber").cast("string").as("version"),
        (col("l_quantity") > 25).as("is_affected"),
        (col("l_quantity") <= 25).as("is_fixed"))
      val sp = s
      import sp.implicits._
      val advisories = (0 until 50).map { k =>
        (s"adv/$k", s"ds${k % 3}", true, s"https://src/adv/$k")
      }.toDF("avid", "datasource_id", "is_latest", "url")
      graft.derive.AdvisoryDerive
        .packageChangeLog(unfurled, advisories)
        .orderBy("purl", "action_type", "avid")
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

    // T6 — pipeline step DAG + run log (BasePipelineRun.execute,
    // pipelines/__init__.py:91-131): ordered steps, stop at the first
    // failure, every attempted step logged. The run log's deterministic
    // columns (sequence, step, exitcode, error; timings excluded) are
    // oracled golden-style: the VALUES literal IS the reference
    // semantics for this fixed 4-step DAG — step 4 must never appear.
    q("t6_pipeline_runlog",
      """SELECT * FROM (VALUES
        |  ('graft-demo', 'r1', 0, 'scan-advisories', 0, ''),
        |  ('graft-demo', 'r1', 1, 'derive-marts', 0, ''),
        |  ('graft-demo', 'r1', 2, 'export', 1, 'export sink unavailable'))
        |  AS t(pipeline_id, run_id, seq, step, exitcode, error)
        |ORDER BY seq""") { (s, dir) =>
      import s.implicits._
      import graft.derive.Pipeline
      val steps = Seq(
        Pipeline.Step("scan-advisories")(() => {
          t(s, dir, "region").count(); ()
        }),
        Pipeline.Step("derive-marts")(() => {
          t(s, dir, "nation").count(); ()
        }),
        Pipeline.Step("export")(() =>
          throw new RuntimeException("export sink unavailable")),
        Pipeline.Step("notify")(() => ()))
      Pipeline.execute("graft-demo", steps, runId = "r1")
        .zipWithIndex
        .map { case (r, i) =>
          (r.pipeline_id, r.run_id, i, r.step, r.exitcode, r.error)
        }
        .toDF("pipeline_id", "run_id", "seq", "step", "exitcode", "error")
        .orderBy("seq")
    },

    // T9 — incremental MERGE-shaped upsert over TWO SUCCESSIVE batches
    // (models.py:1217-1249 confidence-max update): the oracle replays
    // the same two-step upsert in SQL, so incremental ingest
    // correctness no longer rides on full recompute alone. Payloads are
    // a function of the confidence so equal-confidence ties (kept
    // toward the existing row) stay value-identical in both engines.
    q("t9_incremental_upsert",
      """WITH r AS (
        |  SELECT o_custkey % 300 AS key,
        |         CAST(o_orderkey % 97 AS INT) AS confidence,
        |         'p' || CAST(o_orderkey % 97 AS VARCHAR) AS payload,
        |         o_orderkey % 3 AS b
        |  FROM orders),
        |s1 AS (
        |  SELECT key, confidence, payload FROM r WHERE b = 0
        |  QUALIFY row_number() OVER (PARTITION BY key
        |    ORDER BY confidence DESC) = 1),
        |u2 AS (
        |  SELECT key, confidence, payload, 0 AS src FROM s1
        |  UNION ALL
        |  SELECT key, confidence, payload, 1 FROM r WHERE b = 1),
        |s2 AS (
        |  SELECT key, confidence, payload FROM u2
        |  QUALIFY row_number() OVER (PARTITION BY key
        |    ORDER BY confidence DESC, src) = 1),
        |u3 AS (
        |  SELECT key, confidence, payload, 0 AS src FROM s2
        |  UNION ALL
        |  SELECT key, confidence, payload, 1 FROM r WHERE b = 2),
        |s3 AS (
        |  SELECT key, confidence, payload FROM u3
        |  QUALIFY row_number() OVER (PARTITION BY key
        |    ORDER BY confidence DESC, src) = 1)
        |SELECT key, confidence, payload FROM s3 ORDER BY key""") {
      (s, dir) =>
      val rows = t(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(300)).as("key"),
        pmod(col("o_orderkey"), lit(97)).cast("int").as("confidence"),
        concat(lit("p"), pmod(col("o_orderkey"), lit(97)).cast("int"))
          .as("payload"),
        pmod(col("o_orderkey"), lit(3)).as("b"))
      def batch(i: Int) = rows.filter(col("b") === i).drop("b")
      val s1 = graft.derive.Upserts.confidenceMax(
        batch(0).limit(0), batch(0), Seq("key"))
      val s2 = graft.derive.Upserts.confidenceMax(s1, batch(1), Seq("key"))
      val s3 = graft.derive.Upserts.confidenceMax(s2, batch(2), Seq("key"))
      s3.orderBy("key")
    },

    // T10 — PipelineRun status machine (models.py:2035-2122): exitcode
    // 0/88/99/positive → success/stale/stopped/failure; no exitcode →
    // running (started) or queued (created only); runtime for ended runs
    q("t10_run_status",
      s"""WITH $runsFixtureSql
         |SELECT run_id, pipeline_id,
         |       CASE WHEN exitcode = 0 THEN 'success'
         |            WHEN exitcode = 88 THEN 'stale'
         |            WHEN exitcode = 99 THEN 'stopped'
         |            WHEN exitcode > 0 THEN 'failure'
         |            WHEN started_at IS NOT NULL THEN 'running'
         |            WHEN created_at IS NOT NULL THEN 'queued'
         |            ELSE 'unknown' END AS status,
         |       CAST(CASE WHEN started_at IS NOT NULL
         |                  AND ended_at IS NOT NULL
         |                 THEN epoch(ended_at) - epoch(started_at)
         |            END AS BIGINT) AS runtime_s
         |FROM runs ORDER BY run_id""") { (s, dir) =>
      graft.derive.Pipeline.runStatus(runsFixture(s, dir))
        .select("run_id", "pipeline_id", "status", "runtime_s")
        .orderBy("run_id")
    },

    // T11 — PipelineSchedule rollup (models.py:2240-2330): per pipeline
    // the latest run's status, its creation time and the run count
    q("t11_schedule_status",
      s"""WITH $runsFixtureSql,
         |st AS (
         |  SELECT *,
         |         CASE WHEN exitcode = 0 THEN 'success'
         |              WHEN exitcode = 88 THEN 'stale'
         |              WHEN exitcode = 99 THEN 'stopped'
         |              WHEN exitcode > 0 THEN 'failure'
         |              WHEN started_at IS NOT NULL THEN 'running'
         |              WHEN created_at IS NOT NULL THEN 'queued'
         |              ELSE 'unknown' END AS status
         |  FROM runs),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY pipeline_id
         |            ORDER BY created_at DESC, run_id DESC) AS rn,
         |         count(*) OVER (PARTITION BY pipeline_id) AS n
         |  FROM st)
         |SELECT pipeline_id, status AS latest_status,
         |       created_at AS latest_run_date, n AS run_count
         |FROM ranked WHERE rn = 1 ORDER BY pipeline_id""") { (s, dir) =>
      graft.derive.Pipeline.scheduleStatus(runsFixture(s, dir))
        .orderBy("pipeline_id")
    },
  )

  /** PipelineRun-shaped rows from events: created_at is the event time,
    * start/end/exitcode vary by event id so every status branch appears
    * (0 success, 88 stale, 99 stopped, 2 failure, null running, null
    * queued). */
  private def runsFixture(s: SparkSession, dir: String): DataFrame = {
    val e = col("event_id")
    t(s, dir, "events").select(
      e.as("run_id"),
      concat(lit("pl"), pmod(col("user_id"), lit(10))).as("pipeline_id"),
      col("ts").as("created_at"),
      when(pmod(e, lit(5)) =!= 0,
        col("ts") + expr("INTERVAL 1 MINUTE")).as("started_at"),
      when(pmod(e, lit(5)).isin(1, 2, 3),
        col("ts") + expr("INTERVAL 10 MINUTE")).as("ended_at"),
      when(pmod(e, lit(7)) === 0 && pmod(e, lit(5)).isin(1, 2, 3),
        lit(0))
        .when(pmod(e, lit(7)) === 1 && pmod(e, lit(5)).isin(1, 2, 3),
          lit(88))
        .when(pmod(e, lit(7)) === 2 && pmod(e, lit(5)).isin(1, 2, 3),
          lit(99))
        .when(pmod(e, lit(7)) === 3 && pmod(e, lit(5)).isin(1, 2, 3),
          lit(2))
        .cast("int").as("exitcode"))
  }

  private def runsFixtureSql: String =
    """runs AS (
      |  SELECT event_id AS run_id,
      |         'pl' || CAST(user_id % 10 AS VARCHAR) AS pipeline_id,
      |         ts AS created_at,
      |         CASE WHEN event_id % 5 <> 0
      |              THEN ts + INTERVAL 1 MINUTE END AS started_at,
      |         CASE WHEN event_id % 5 IN (1, 2, 3)
      |              THEN ts + INTERVAL 10 MINUTE END AS ended_at,
      |         CASE WHEN event_id % 5 NOT IN (1, 2, 3) THEN NULL
      |              WHEN event_id % 7 = 0 THEN 0
      |              WHEN event_id % 7 = 1 THEN 88
      |              WHEN event_id % 7 = 2 THEN 99
      |              WHEN event_id % 7 = 3 THEN 2
      |              ELSE NULL END AS exitcode
      |  FROM events)""".stripMargin
}
