package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Dev profiler: time one or more SparkEntry queries cold (catalog cache
  * cleared between runs, like Bench) and optionally dump the formatted
  * physical plan.
  *
  * Usage: runMain graft.tools.Profile <sfDir> [-explain] <name> [name...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val explain = args.contains("-explain")
    val names = args.tail.filterNot(_ == "-explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.all.foreach { n =>
      try graft.core.Tables(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      if (explain) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
