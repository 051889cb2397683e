package graft.derive

import java.sql.Timestamp

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
}
