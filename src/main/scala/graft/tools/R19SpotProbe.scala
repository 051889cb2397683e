package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Stage attribution for the round-19 REHEARSAL_100X spot rows
  * (verdict #6): s23_ssvc_set_trees 20.4× and d18_vuln_status 17.0×
  * at factor 100 — the SpotStageProbe pattern. Diagnostic only.
  *
  * Hypotheses:
  *  - s23: the cost is the members-fanout broadcast join (each
  *    lineitem ssvc row fans to its avid's ~30 sets → ~30× the scan
  *    volume into the partial agg) collapsing map-side onto a BOUNDED
  *    key space (30 sets × 9 source_urls = 270 groups). If
  *    scan ≪ fanout-agg ≈ full, the ratio is the fanout's, and it
  *    stays sublinear because the agg never shuffles more than 270
  *    groups per partition.
  *  - d18: map-only JSON-path extraction whose OUTPUT is the corpus
  *    (one row per order) plus the gate's global orderBy — if
  *    project-only ≈ statuses-no-sort ≪ full, the sort is the
  *    dominant term and the ratio is the linear-output floor, like
  *    x_materialize_sequences' 13×.
  */
object R19SpotProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(n: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      val rows = f
      println(f"[spot] $n%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$rows%,d")
    }

    // ------------------------------------------------------ s23 stages
    val ssvc = Tables(spark, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("E:"), col("l_linenumber")).as("vector"),
      when(col("l_quantity") > 25, "Act").otherwise("Track")
        .as("decision"),
      concat(lit("o"), pmod(col("l_suppkey"), lit(3))).as("options"),
      concat(lit("https://ssvc.example/s"), pmod(col("l_partkey"), lit(9)))
        .as("source_url"))
    val members = Tables(spark, dir, "orders").select(
      pmod(col("o_orderkey"), lit(30)).as("set_id"),
      concat(lit("adv/"), pmod(col("o_custkey"), lit(50))).as("avid"))
      .distinct()
    timed("s23 stage: ssvc scan+project")(ssvc.count())
    timed("s23 stage: members distinct")(members.count())
    timed("s23 stage: fanout join, no agg") {
      ssvc.join(broadcast(members), Seq("avid")).count()
    }
    timed("s23 stage: fanout + per-src arg_min agg") {
      ssvc.join(broadcast(members), Seq("avid"))
        .groupBy("set_id", "source_url")
        .agg(min(struct(col("avid"), col("vector"), col("decision"),
          col("options"))).as("t"))
        .count()
    }
    (1 to 2).foreach { _ =>
      timed("s23 full (bench shape, noop sink)") {
        graft.SparkEntry.queries("s23_ssvc_set_trees")(spark, dir)
          .write.format("noop").mode("overwrite").save(); 1L
      }
    }

    // ------------------------------------------------------ d18 stages
    val records = Tables(spark, dir, "orders").select(
      concat(lit("CVE-2020-"), col("o_orderkey")).as("cve_id"),
      when(pmod(col("o_orderkey"), lit(4)) === 0,
        lit("""{"cveMetadata":{"state":"REJECTED"},""" +
          """"containers":{"cna":{"tags":["x","disputed"]}}}"""))
        .when(pmod(col("o_orderkey"), lit(4)) === 1,
          lit("""{"cveMetadata":{"state":"REJECTED"},""" +
            """"containers":{"cna":{"tags":["x"]}}}"""))
        .when(pmod(col("o_orderkey"), lit(4)) === 2,
          lit("""{"cveMetadata":{"state":"PUBLISHED"},""" +
            """"containers":{"cna":{"tags":["x"]}}}"""))
        .as("body"))
    // count() consumption lets Catalyst PRUNE the JSON parse (the
    // round-15 count-mode hollowing) — consume through an aggregate of
    // the computed column to force the parse, and through the noop sink
    // to price the output materialization the bench pays
    timed("d18 stage: scan+project, len(body) agg") {
      records.agg(sum(length(col("body")))).collect(); 1L
    }
    timed("d18 stage: statuses agg (parse, no output)") {
      graft.derive.Improvers.vulnerabilityStatuses(records)
        .agg(sum(col("status"))).collect(); 1L
    }
    (1 to 2).foreach { _ =>
      timed("d18 full (bench shape, noop sink)") {
        graft.SparkEntry.queries("d18_vuln_status")(spark, dir)
          .write.format("noop").mode("overwrite").save(); 1L
      }
    }
    spark.stop()
  }
}
