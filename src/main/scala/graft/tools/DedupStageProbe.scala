package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Sessions, Tables}
import graft.operators.{Corpus, TextDedup}

/** Stage-level probe for the minhash dedup pipeline's scaling behavior:
  * counts and times (a) the plain LSH pair join, (b) the
  * exact-collapse pair join, and (c) the full cluster pipeline over
  * each, on any testdata directory (use ScaleGen output for 10×/100×).
  * Prints one JSON line. Diagnostic tooling — not part of the bench or
  * verify contracts.
  *
  * Usage: runMain graft.tools.DedupStageProbe <dir> [plain|collapsed|both]
  */
object DedupStageProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val distinctTexts = docs.selectExpr("count(distinct text)").head.getLong(0)

    def probe(name: String,
        pairsOf: () => org.apache.spark.sql.DataFrame): String = {
      val (nPairs, tPairs) = timed(pairsOf().count())
      val (nClusters, tFull) = timed(
        Corpus.dedupClustersFromPairs(docs, pairsOf(), "doc_id", "n_chars")
          .count())
      f"""\"$name\":{\"pairs\":$nPairs,\"sec_pairs\":$tPairs%.1f,""" +
        f"""\"clusters\":$nClusters,\"sec_full\":$tFull%.1f}"""
    }

    val parts = Seq(
      if (mode != "collapsed")
        Some(probe("plain",
          () => TextDedup.minHashLshPairs(docs, "text", "doc_id")))
      else None,
      if (mode != "plain")
        Some(probe("collapsed",
          () => TextDedup.minHashLshPairsCollapsed(docs, "text", "doc_id")))
      else None).flatten

    println(s"""{"dir":"$dir","docs":$nDocs,""" +
      s""""distinct_texts":$distinctTexts,${parts.mkString(",")}}""")
    spark.stop()
  }
}
