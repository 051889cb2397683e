package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Corpus

/** Shuffle-byte A/B for the chunk-family digest twins (round-14
  * directive #1): runs the string-keyed (oracle) and digest-keyed
  * (library) forms of chunkDupStats and stripCorpusBoilerplate over any
  * testdata dir and prints each run's total shuffle WRITE bytes and
  * wall time, measured by a stage-completion listener. Every plan is
  * forced through a full-width checksum so column pruning cannot drop
  * the rebuilt text from the measurement. Diagnostic tooling only.
  *
  * Measured at 10× (/tmp/sf1x, 50k docs — the rehearsal corpus), 2026-08-15:
  *   chunk_exact  16.1 MB shuffled, 3.93 s   chunk_digest  8.6 MB, 1.89 s
  *   strip_exact  15.4 MB shuffled, 2.85 s   strip_digest  9.0 MB, 1.91 s
  * — 1.9× / 1.7× fewer shuffle bytes and ~2× wall, with IDENTICAL
  * full-width checksums on both pairs (the zero-collision check). The
  * byte ratio is deflated by the synthetic corpus: its 31-word
  * vocabulary makes 10-token chunks ~60 B and snappy-friendly; on real
  * crawl text (unbounded vocab, longer tokens) the string side grows
  * with the data while the digest side stays 16 B/chunk.
  */
object ChunkShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val docs = Tables(spark, dir, "documents").cache()
    println(s"[chunkprobe] corpus = ${docs.count()} docs")

    def measure(name: String)(df: => DataFrame): Unit = {
      // settle the async listener bus before snapshotting the counter
      Thread.sleep(2000)
      val before = shuffleBytes.get()
      val t0 = System.nanoTime()
      // checksum over every output column defeats pruning: the rebuilt
      // text and all counters must actually materialize
      val d = df
      val chk = d.select(
        sum(xxhash64(d.columns.map(col): _*).cast("decimal(38,0)"))
          .as("chk")).head().getDecimal(0)
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val bytes = shuffleBytes.get() - before
      println(f"[chunkprobe] $name%-14s shuffleWrite=${bytes / 1048576.0}%9.1f MB" +
        f"  wall=$secs%6.2f s  chk=$chk%s")
    }

    measure("chunk_exact") {
      Corpus.chunkDupStats(docs, "text", "doc_id",
        chunkTokens = 10, flagAt = 0.5, digestKeyed = false)
    }
    measure("chunk_digest") {
      Corpus.chunkDupStats(docs, "text", "doc_id",
        chunkTokens = 10, flagAt = 0.5)
    }
    measure("strip_exact") {
      Corpus.stripCorpusBoilerplate(docs, "text", "doc_id",
        chunkTokens = 10, dfThreshold = 2, digestKeyed = false)
    }
    measure("strip_digest") {
      Corpus.stripCorpusBoilerplate(docs, "text", "doc_id",
        chunkTokens = 10, dfThreshold = 2)
    }
    spark.stop()
  }
}
