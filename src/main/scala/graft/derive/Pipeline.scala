package graft.derive

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minimal pipeline step runner (SURVEY T5/T6): ordered named steps with
  * per-step timing, error capture and an append-able run log — the engine
  * analog of BasePipelineRun.execute (pipelines/__init__.py:91-131) and
  * PipelineRun metadata (models.py:1972-2032). Orchestration stays driver-
  * side by design; the steps themselves launch distributed Spark jobs.
  */
object Pipeline {

  final case class Step(name: String)(val run: () => Unit)

  final case class StepResult(
      pipeline_id: String,
      run_id: String,
      step: String,
      started_at: Timestamp,
      duration_s: Double,
      exitcode: Int,
      error: String)

  /** Execute steps in order; stops at the first failure (the reference's
    * on_failure semantics) and returns the run log either way. */
  def execute(pipelineId: String, steps: Seq[Step],
      runId: String = java.util.UUID.randomUUID().toString): Seq[StepResult] = {
    val results = Seq.newBuilder[StepResult]
    var failed = false
    steps.foreach { step =>
      if (!failed) {
        val start = System.currentTimeMillis()
        val (exit, err) =
          try { step.run(); (0, "") }
          catch { case e: Exception => (1, String.valueOf(e.getMessage)) }
        results += StepResult(pipelineId, runId, step.name,
          new Timestamp(start), (System.currentTimeMillis() - start) / 1000.0,
          exit, err)
        failed = exit != 0
      }
    }
    results.result()
  }

  /** Run-status derivation (PipelineRun.status, models.py:2035-2068 +
    * the exitcode predicates at 2090-2122): exitcode 0 → success,
    * 88 → stale, 99 → stopped, any other positive → failure; with no
    * exitcode yet, a start date means running and a created date
    * queued; unknown otherwise. `runtime_s` is end − start for ended
    * runs (the reference's now()-based running runtime is skipped —
    * nondeterministic by construction).
    *
    * Input columns: pipeline_id, run_id, created_at, started_at
    * (nullable), ended_at (nullable), exitcode (nullable int). Pure
    * projection — status is a codegen'd CASE chain, no shuffle. */
  def runStatus(runs: DataFrame): DataFrame =
    runs.withColumn("status",
      when(col("exitcode") === 0, "success")
        .when(col("exitcode") === 88, "stale")
        .when(col("exitcode") === 99, "stopped")
        .when(col("exitcode") > 0, "failure")
        .when(col("started_at").isNotNull, "running")
        .when(col("created_at").isNotNull, "queued")
        .otherwise("unknown"))
      .withColumn("runtime_s",
        when(col("started_at").isNotNull && col("ended_at").isNotNull,
          unix_timestamp(col("ended_at")) -
            unix_timestamp(col("started_at"))))

  /** Schedule rollup (PipelineSchedule.status / latest_run_date /
    * all_runs, models.py:2240-2330): per pipeline, the status of the
    * LATEST run (created_at order, run_id tiebreak) plus the run count
    * and latest creation time. One window over the per-pipeline
    * partition. */
  def scheduleStatus(runs: DataFrame): DataFrame = {
    val w = Window.partitionBy("pipeline_id")
      .orderBy(col("created_at").desc, col("run_id").desc)
    runStatus(runs)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy("pipeline_id")))
      .filter(col("_rn") === 1)
      .select(col("pipeline_id"), col("status").as("latest_status"),
        col("created_at").as("latest_run_date"), col("_n").as("run_count"))
  }
}
