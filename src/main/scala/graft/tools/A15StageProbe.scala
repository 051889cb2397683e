package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.derive.AdvisoryDerive

/** Stage attribution for a15_advisory_ledger's 100× spot (round-14
  * watch item: 42.6 s, the second-largest absolute 100× cost, blamed on
  * "the content-id window over the raw log plus membership label
  * propagation" without numbers). Rebuilds the a15 bench fixture and
  * times the composition's stages separately:
  *   1. content-id + is_latest window over the raw log (the one
  *      full-log shuffle);
  *   2. the localCheckpoint materialization the ledger pays so four
  *      consumers share one scan;
  *   3. membership (alias explode + advisorySets label propagation);
  *   4. unfurl + package counts;
  *   5. the exact bench shape (SparkEntry.queries) twice.
  * Diagnostic tooling only. */
object A15StageProbe {
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
      println(f"[a15] $n%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$rows%,d")
    }

    val refType = "array<struct<reference_id:string," +
      "reference_type:string,url:string>>"
    val k = pmod(col("o_orderkey"), lit(500))
    val rev = pmod(col("o_orderkey"), lit(7))
    def raw = Tables(spark, dir, "orders").select(
      lit("src").as("datasource_id"),
      concat(lit("ADV-"), k).as("advisory_id"),
      concat(lit("summary "), k, lit(" r"), rev).as("summary"),
      array(concat(lit("AL-"), pmod(k, lit(250))),
        concat(lit("BL-"), expr("(o_orderkey % 500) div 2")))
        .as("aliases"),
      when(pmod(k, lit(13)) === 0, array(struct(
        lit("r1").as("reference_id"),
        lit("exploit").as("reference_type"),
        lit("https://exploit.example/x").as("url"))))
        .otherwise(expr("array()").cast(refType)).as("references"),
      array(struct(lit("generic").as("scoring_system"),
        pmod(k, lit(10)).cast("string").as("value"),
        lit("").as("scoring_elements"),
        lit("https://sev.example/s").as("url"))).as("severities"),
      array(struct(
        concat(lit("pkg:npm/p"), pmod(k, lit(20))).as("purl"),
        concat(lit("vers:generic/>="), pmod(k, lit(3)) + 1,
          lit("|<="), pmod(k, lit(3)) + 4).as("affecting_vers"),
        concat(lit("vers:generic/="), pmod(k, lit(3)) + 5)
          .as("fixed_vers"))).as("affected"),
      to_timestamp(concat(lit("2024-01-0"), rev + 1))
        .as("date_collected"),
      pmod(k, lit(7)).as("precedence"))
    val dim = Tables(spark, dir, "part").select(
      concat(lit("pkg:npm/p"), pmod(col("p_partkey"), lit(20)))
        .as("base_purl"),
      (pmod(col("p_partkey"), lit(8)) + 1).cast("string").as("version"))
      .distinct()

    timed("stage 1: content-id window (no ckpt)") {
      AdvisoryDerive.withContentIdAndLatest(raw).count()
    }
    timed("stage 2: window + localCheckpoint") {
      AdvisoryDerive.withContentIdAndLatest(raw).localCheckpoint().count()
    }
    locally {
      val adv = AdvisoryDerive.withContentIdAndLatest(raw).localCheckpoint()
      adv.count()
      val t0 = System.nanoTime()
      val rows = graft.derive.VulnerabilityV1.membership(spark, adv).count()
      println(f"[a15] ${"stage 3: membership over ckpt"}%-40s " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows%,d")
      val t1 = System.nanoTime()
      val unf = AdvisoryDerive.unfurl(AdvisoryDerive.impacts(adv), dim)
      val cnt = graft.serve.Serving.advisoryPackageCounts(unf).count()
      println(f"[a15] ${"stage 4: unfurl + counts over ckpt"}%-40s " +
        f"${(System.nanoTime() - t1) / 1e9}%7.2f s  rows=$cnt%,d")
    }
    timed("full (bench shape)") {
      graft.SparkEntry.queries("a15_advisory_ledger")(spark, dir).count()
    }
    timed("full (bench shape)") {
      graft.SparkEntry.queries("a15_advisory_ledger")(spark, dir).count()
    }
    spark.stop()
  }
}
