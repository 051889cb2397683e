package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Corpus

/** Stage attribution for x_incremental_bm25's 100× spot: the benched
  * query rebuilds BOTH index sides from raw text (the bootstrap +
  * arrival-delta tokenize/groupBy passes) and then serves one query
  * from the union — so the spot is expected to be bootstrap-bound,
  * with the steady-state serving cost (query-term posting lists + the
  * docLens stats agg over a PERSISTED index) a small fraction. This
  * probe materializes the index to parquet once and times the two
  * parts separately. Diagnostic tooling only.
  *
  * Usage: runMain graft.tools.Bm25StageProbe [dataDir=/tmp/sf100x]
  */
object Bm25StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf100x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(n: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bm25] $n%-42s reps=${ts.map(t => f"$t%.2f").mkString("/")}" +
        f"  warm=${ts.min}%7.2f s")
    }
    timed("canary (400M xxhash64 bit_xor)") {
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
    }
    val d = Tables(spark, dir, "documents")
    val arrivals = d.filter(pmod(col("doc_id"), lit(10)) === 7)
    val admitted = d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val ixDir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    timed("bootstrap+delta index build (noop)") {
      val (p0, l0) = Corpus.bm25IndexDelta(admitted, "text", "doc_id")
      val (p1, l1) = Corpus.bm25IndexDelta(arrivals, "text", "doc_id")
      p0.unionAll(p1).write.format("noop").mode("overwrite").save()
      l0.unionAll(l1).write.format("noop").mode("overwrite").save()
    }
    // persist once, then time serving from the PERSISTED index
    val (p0, l0) = Corpus.bm25IndexDelta(admitted, "text", "doc_id")
    val (p1, l1) = Corpus.bm25IndexDelta(arrivals, "text", "doc_id")
    p0.unionAll(p1).write.mode("overwrite").parquet(s"$ixDir/postings")
    l0.unionAll(l1).write.mode("overwrite").parquet(s"$ixDir/doclens")
    val postings = spark.read.parquet(s"$ixDir/postings")
    val docLens = spark.read.parquet(s"$ixDir/doclens")
    timed("indexed search from persisted index (noop)") {
      Corpus.bm25SearchIndexed(postings, docLens, "doc_id",
          "scan filter sort", k = 20)
        .write.format("noop").mode("overwrite").save()
    }
    timed("full bench shape (noop)") {
      graft.SparkEntry.queries("x_incremental_bm25")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
