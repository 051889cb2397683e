package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line with the total and the
  * slowest-40 per-query seconds.
  *
  * The driver captures only the last ~2000 chars of stdout, so the printed line
  * must stay well under that or it is truncated mid-JSON and never parses
  * (BENCH_r02/r04 both recorded `parsed: null` for exactly this reason). The
  * full-precision per-query map is written to `BENCH_FULL.json` in the working
  * directory instead, and BASELINE.md points at it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers once so per-query numbers measure the
    // plan, not first-touch classloading.
    graft.core.Tables.all.foreach { n =>
      try graft.core.Tables(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullJson = results
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString(
        s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"sf":"$sfDir","queries":{""",
        ",",
        "}}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Compact stdout contract line: slowest 40 queries, 3-decimal seconds.
    val top = results.sortBy(-_._2).take(40).sortBy(_._1)
    val qs = top.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"detail":"BENCH_FULL.json","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
