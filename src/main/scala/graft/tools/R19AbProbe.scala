package graft.streaming
// lives in the streaming package for readState/writeState access;
// file kept under tools/ beside the other probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the round-19 curationSink arrival-checkpoint change.
  *
  * Cross-process A/B on this host proved unreadable (VM window drift
  * swings reps 4× within one run — BASELINE.md's drift rule), so this
  * probe interleaves the NEW sink (DocumentStreaming.curationSink at
  * HEAD) with an inline copy of the OLD (pre-round-19-opt) sink body in
  * ONE JVM, alternating rounds so ambient bursts average across both
  * sides. Prints per-round wall seconds; read the MIN per side.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.streaming.R19AbProbe [rounds]"
  */
object R19AbProbe {

  /** Verbatim pre-optimization curationSink body (git 9442c65), kept
    * here only as the A/B baseline. */
  private def oldCurationSink(root: String, textCol: String, idCol: String,
      n: Int = 2, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, windowTokens: Int = 20,
      shingleN: Int = 3, flagAt: Double = 0.8)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    import graft.operators.{Corpus, TextDedup}
    import DocumentStreaming.{readState, writeState}

    val quality = Corpus.qualityFlags(batch, textCol)
      .select(col(idCol), col("passes"))
    val qualified = batch.join(
      quality.filter(col("passes")).select(col(idCol)), Seq(idCol))

    val sigIndex = readState(spark, s"$root/minhash_index", TextDedup
      .minHashSignatures(batch.limit(0), textCol, idCol, n, numHashes),
      batchId)
    val (decisions, keptSig) = TextDedup.incrementalMinHashDedup(
      qualified, sigIndex, textCol, idCol, n, numHashes, bands, threshold)
    val keptDocs = qualified.join(
      decisions.filter(col("keep")).select(col("id").as(idCol)),
      Seq(idCol))

    val subIndex = readState(spark, s"$root/substring_index", Corpus
      .substringDigestIndex(batch.limit(0), textCol, idCol, windowTokens),
      batchId)
    val (strippedRaw, _) = Corpus.incrementalSubstringStrip(
      keptDocs, subIndex, textCol, idCol, windowTokens)
    val stripped = strippedRaw.localCheckpoint()

    val vocab = {
      val empty =
        Corpus.benchmarkVocab(batch.limit(0), textCol, idCol, shingleN)
      try spark.read.schema(empty.schema).parquet(s"$root/vocab")
      catch { case _: org.apache.spark.sql.AnalysisException => empty }
    }
    val contam = Corpus.incrementalContamination(
      stripped.withColumnRenamed("text", textCol), vocab,
      textCol, idCol, shingleN, flagAt)

    val ledger = quality
      .join(decisions.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .join(stripped.select(col(idCol),
        col("stripped_tokens"), col("text").as("_stripped")),
        Seq(idCol), "left")
      .join(contam.select(col(idCol), col("contamination"),
        col("contaminated")), Seq(idCol), "left")
      .select(col(idCol), col("passes"),
        coalesce(col("dup_of_index"), lit(false)).as("dup_of_index"),
        coalesce(col("dup_of_delta"), lit(false)).as("dup_of_delta"),
        coalesce(col("keep"), lit(false)).as("keep"),
        coalesce(col("stripped_tokens"), lit(0L)).as("stripped_tokens"),
        coalesce(col("contamination"), lit(0.0)).as("contamination"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        coalesce(length(trim(col("_stripped"))) === 0, lit(false))
          .as("stripped_empty"),
        (col("passes") && coalesce(col("keep"), lit(false)) &&
          !coalesce(col("contaminated"), lit(false)) &&
          coalesce(length(trim(col("_stripped"))) > 0, lit(false)))
          .as("admitted"),
        col("_stripped"))
      .localCheckpoint()

    val admittedIds = ledger.filter(col("admitted")).select(col(idCol))
    writeState(ledger.drop("_stripped"), s"$root/ledger", batchId)
    writeState(ledger.filter(col("admitted"))
      .select(col(idCol), col("_stripped").as(textCol)),
      s"$root/admitted", batchId)
    writeState(keptSig.join(
      admittedIds.withColumnRenamed(idCol, "id"), Seq("id")),
      s"$root/minhash_index", batchId)
    writeState(graft.operators.Corpus.substringDigestIndex(
        ledger.filter(col("admitted"))
          .select(col(idCol), col("_stripped").as(textCol)),
        textCol, idCol, windowTokens)
      .join(subIndex, Seq("h1", "h2"), "left_anti"),
      s"$root/substring_index", batchId)
  }

  private def runOnce(s: SparkSession, dir: String,
      sinkOf: String => (DataFrame, Long) => Unit): Double = {
    val d = graft.core.Tables(s, dir, "documents")
    val isBench = pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
    val corpus = d.filter(!isBench).select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_ab_curation").toString
    try {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      DocumentStreaming.registerSuite(s, s"$root/vocab",
        d.filter(isBench), "text", "doc_id", n = 3)
      val sink = sinkOf(root)
      val t0 = System.nanoTime()
      (0 until 3).foreach { b =>
        sink(corpus.filter(pmod(col("doc_id"), lit(3)) === b), b.toLong)
      }
      // consume like the query does: ledger count (cheap readback)
      s.read.parquet(s"$root/ledger").count()
      (System.nanoTime() - t0) / 1e9
    } finally graft.core.Scratch.deleteRec(root)
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local("graft-ab")
    // warm both paths once (untimed) to kill first-run JIT ordering bias
    runOnce(s, dir, r => DocumentStreaming.curationSink(
      r, "text", "doc_id"))
    runOnce(s, dir, r => oldCurationSink(r, "text", "doc_id"))
    val news = Vector.newBuilder[Double]; val olds = Vector.newBuilder[Double]
    (1 to rounds).foreach { i =>
      val tNew = runOnce(s, dir, r => DocumentStreaming
        .curationSink(r, "text", "doc_id"))
      val tOld = runOnce(s, dir, r => oldCurationSink(r, "text", "doc_id"))
      news += tNew; olds += tOld
      println(f"[ab] round $i%d new=$tNew%.2f old=$tOld%.2f")
    }
    val (nv, ov) = (news.result(), olds.result())
    println(f"[ab] NEW min=${nv.min}%.2f median=${nv.sorted.apply((nv.size-1)/2)}%.2f")
    println(f"[ab] OLD min=${ov.min}%.2f median=${ov.sorted.apply((ov.size-1)/2)}%.2f")
    s.stop()
  }
}
