package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Similarity

/** Stage probe for x_ann_ivf_trained (the one >linear REHEARSAL_100X
  * row in round 12): times the three stages of the trained IVF path —
  * Lloyd training, corpus assignment, probe search — separately over
  * any testdata dir, and prints the probe count and candidate-pair
  * volume of the search join. Diagnostic tooling only.
  *
  * The hypothesis it decides: the benchmark query's probe set is the
  * RELATIVE `vec_id % 100 = 0` sample, so probes grow with the corpus
  * and the search join's candidate volume grows as
  * |probes| x |corpus|/k — an O(N^2/100k) term that linear-in-N
  * stages hide at small factors.
  */
object IvfStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = Tables(spark, dir, "embeddings").cache()
    println(s"[ivfprobe] corpus = ${e.count()} vectors")

    val cent = timed("stage 1: trainCentroids (1 Lloyd round)") {
      val c = Similarity
        .trainCentroids(e, "vec_id", "embedding", k = 4, iters = 1)
        .select(col("centroid_id"),
          transform(col("vec"), v => round(v, 6)).as("vec"))
        .localCheckpoint()
      c.count()
      c
    }

    val corpusAssigned = timed("stage 2: corpus assignToCentroids") {
      val a = Similarity
        .assignToCentroids(e, cent, "vec_id", "embedding")
        .select("vec_id", "embedding", "centroid_id")
        .localCheckpoint()
      a.count()
      a
    }

    // same probe set as the benchmark query: the %100 sample under the
    // ABSOLUTE cap (round-13 fix). Pass "uncapped" as argv(1) to
    // reproduce the pre-fix relative sample the round-12 diagnosis
    // measured.
    val uncapped = args.length > 1 && args(1) == "uncapped"
    val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 &&
        (if (uncapped) lit(true) else col("vec_id") < 100000))
      .select(col("vec_id"), col("embedding"))
    val nProbes = probes.count()
    // candidate volume of the search join = sum over probes of their
    // assigned centroid's list size
    val listSizes = corpusAssigned.groupBy("centroid_id")
      .agg(count(lit(1)).as("list_n"))
    val probeAssign = Similarity
      .assignToCentroids(probes, cent, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
    val candVolume = probeAssign.join(listSizes, Seq("centroid_id"))
      .agg(sum("list_n")).head().getLong(0)
    println(s"[ivfprobe] probes = $nProbes, search candidate pairs = $candVolume")

    timed("stage 3: ivfTopK probe search") {
      Similarity.ivfTopK(probes, corpusAssigned, cent,
        "vec_id", "embedding", k = 5).count()
    }
    spark.stop()
  }
}
