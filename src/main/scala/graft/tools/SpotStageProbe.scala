package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Corpus

/** Stage attribution for the three REHEARSAL_100X ratios that round 14
  * left unattributed (s25_all_vulnerable_purls 12.5×, x_soft_dedup
  * 18.8×, d16_default_inferences 14.5×) — the FanoutStageProbe /
  * IvfStageProbe pattern: rebuild each query's bench fixture, time the
  * stages separately over any testdata dir, and time the EXACT bench
  * shape via SparkEntry.queries so the full number is the artifact
  * number. Diagnostic tooling only.
  *
  * Hypotheses being tested:
  *  - s25: the endpoint's semantic global orderBy (Serving.scala) is
  *    suspected to be the whole cost; but under the bench's count()
  *    Catalyst's EliminateSorts removes a sort below a count-aggregate,
  *    so the cost should instead be the two lineitem-scale distincts
  *    (pkg dim + vulnerable edge) feeding the semi-join — scan-bound.
  *  - x_soft_dedup: pairs (shingle join + exact-Jaccard confirm) vs CC
  *    label propagation vs the weight aggregation — the capped pair
  *    join is the suspected bulk.
  *  - d16: map-only endpoint algebra over the orders scan; the one
  *    shuffle is the packageless left-anti on avid. If impacts-scan ≈
  *    full, the ratio is scan-bound, as the "map-only" note asserted.
  */
object SpotStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
      println(f"[spot] $n%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$rows%,d")
    }
    def bench(name: String): Unit =
      timed(s"$name full (bench shape)") {
        graft.SparkEntry.queries(name)(spark, dir).count()
      }

    // ------------------------------------------------------- s25 stages
    val pkgs = Tables(spark, dir, "lineitem").select(
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      when(pmod(col("l_partkey"), lit(3)) === 0, "?arch=x")
        .otherwise("").as("quals"))
      .distinct()
      .select(col("base_purl"), col("version"),
        concat(col("base_purl"), lit("@"), col("version"), col("quals"))
          .as("package_url"))
    val vulnEdge = Tables(spark, dir, "lineitem").select(
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"))
      .filter(col("l_quantity") > 25)
      .distinct()
    timed("s25 stage: pkg dim distinct")(pkgs.count())
    timed("s25 stage: vulnerable edge distinct")(vulnEdge.count())
    timed("s25 semi-join, NO orderBy") {
      pkgs.join(vulnEdge, Seq("base_purl", "version"), "left_semi")
        .select("package_url").count()
    }
    bench("s25_all_vulnerable_purls")
    bench("s25_all_vulnerable_purls")

    // ------------------------------------------------ soft-dedup stages
    val docs = Tables(spark, dir, "documents")
    timed("soft stage: confirmed pairs") {
      Corpus.confirmedNearDupPairs(docs, "text", "doc_id",
        n = 2, threshold = 0.5, maxDf = 40).count()
    }
    // CC isolated: pairs cached and materialized first, CC timed alone
    // (no clearing between — the pairs pipeline localCheckpoints
    // internally and the preamble would drop its blocks)
    locally {
      val cached = Corpus.confirmedNearDupPairs(docs, "text", "doc_id",
        n = 2, threshold = 0.5, maxDf = 40).cache()
      cached.count()
      val t0 = System.nanoTime()
      val rows = Corpus.dedupComponents(cached).count()
      println(f"[spot] ${"soft stage: CC over cached pairs"}%-38s " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows%,d")
      cached.unpersist(blocking = true)
    }
    bench("x_soft_dedup")
    bench("x_soft_dedup")

    // ------------------------------------------------------- d16 stages
    val lo = pmod(col("o_orderkey"), lit(4)) + 1
    val impacts = Tables(spark, dir, "orders").select(
      concat(lit("adv/"), pmod(col("o_orderkey"), lit(40))).as("avid"),
      lit("npm").as("ptype"), lit("").as("namespace"),
      concat(lit("p"), pmod(col("o_custkey"), lit(20))).as("name"),
      lit("").as("qualifiers"),
      concat(lit("vers:generic/>="), lo, lit("|<="), lo + 2,
        lit("|!=9")).as("affecting_vers"),
      when(pmod(col("o_orderkey"), lit(3)) === 0,
        (lo + 3).cast("string")).as("fixed_version"))
    val advisories = Tables(spark, dir, "orders")
      .select(concat(lit("adv/"), pmod(col("o_orderkey"), lit(50)))
        .as("avid")).distinct()
    timed("d16 stage: impacts scan")(impacts.count())
    timed("d16 stage: endpoint algebra, map-only") {
      impacts.select(
        call_function("vers_endpoints_native", col("affecting_vers"))
          .as("a"),
        call_function("vers_excluded_native", col("affecting_vers"))
          .as("x"))
        .select(size(col("a")) + size(col("x"))).count()
    }
    timed("d16 stage: packageless anti-join") {
      advisories.join(impacts.select("avid").distinct(),
        Seq("avid"), "left_anti").count()
    }
    bench("d16_default_inferences")
    bench("d16_default_inferences")

    spark.stop()
  }
}
