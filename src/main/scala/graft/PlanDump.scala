package graft

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (plans/r<N>/<query>_<tag>.txt).
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <tag> <query> [query ...]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  *      SPARK_GRAFT_CPUS (default 32).
  *
  * Formatted explain shows the INITIAL plan (AdaptiveSparkPlan
  * isFinalPlan=false) — Exchange placement, join strategy,
  * PushedFilters/ReadSchema are all decided there, which is what the
  * optimization claims cite. Queries that drive imperative harnesses
  * (the foreachBatch sink gates) explain their final READBACK frame;
  * their per-batch plans are not a single DataFrame to explain, so for
  * those rows the evidence is the probe's job/codegen counts instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val spark = graft.core.Sessions.local("graft-plandump")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.drop(2).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote ${name}_$tag.txt")
      }
    }
    spark.stop()
  }
}
