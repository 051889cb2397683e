package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the hot bench queries (not part of the
  * library surface; run via `sbt "runMain graft.tools.Profile"`). */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir, "documents")
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    time("warm: docs+emb count") { docs.count(); emb.count() }

    time("x_embed_lsh end-to-end (native)") {
      println("  pairs: " + graft.operators.Similarity
        .signLshPairs(emb, "vec_id", "embedding").count())
    }

    // --- minHashLshPairs stages ---
    val sh = time("shingles count") {
      val s = graft.operators.TextDedup.shingles(docs, "text", "doc_id", 2)
      println("  shingle rows: " + s.count()); s
    }
    val sig = time("minhash signatures (16) localCheckpoint") {
      graft.operators.TextDedup
        .minHashSignatures(docs, "text", "doc_id", 2, 16).localCheckpoint()
    }
    time("minhash capped end-to-end") {
      println("  pairs: " + graft.operators.TextDedup
        .minHashLshPairs(docs, "text", "doc_id", 2, 16, 4, 0.5, 2).count())
    }
    time("minhash uncapped (8 hashes) x_minhash_lsh shape") {
      println("  rows: " + graft.SparkEntry.queries("x_minhash_lsh")(spark, sfDir).count())
    }
    time("x_ngram_jaccard_capped end-to-end") {
      println("  pairs: " + graft.operators.TextDedup
        .ngramJaccardPairs(docs, "text", "doc_id", 2, 0.5, 40).count())
    }
    time("x_dedup_pipeline end-to-end") {
      println("  rows: " + graft.operators.Corpus
        .dedupClusters(docs, "text", "doc_id", "n_chars", 2, 0.5, 40).count())
    }
    spark.stop()
  }
}
