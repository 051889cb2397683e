package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Stage probe for the s19/s20/d4 fixed cost: times the advisory
  * fixture scan, the membership derivation, and its pieces over any
  * testdata dir. Diagnostic tooling only.
  */
object TrioProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def advisories = {
      val refType = "array<struct<reference_id:string," +
        "reference_type:string,url:string>>"
      Tables(spark, dir, "orders")
        .select(pmod(col("o_orderkey"), lit(500)).as("k")).distinct()
        .select(
          concat(lit("adv/"), col("k")).as("avid"),
          concat(lit("ADV-"), col("k")).as("advisory_id"),
          lit(true).as("is_latest"),
          pmod(col("k"), lit(7)).as("precedence"),
          concat(lit("summary "), col("k")).as("summary"),
          array(concat(lit("AL-"), pmod(col("k"), lit(250))),
            concat(lit("BL-"), expr("k div 2"))).as("aliases"),
          array().cast("array<struct<scoring_system:string,value:string," +
            "scoring_elements:string,url:string>>").as("severities"),
          array().cast(refType).as("references"))
    }

    def timed(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $n = $r rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    timed("fixture scan (distinct)")(advisories.count())
    val cp = advisories.localCheckpoint()
    timed("checkpointed fixture re-count")(cp.count())
    timed("advisorySets")(
      graft.derive.AdvisoryDerive.advisorySets(spark, cp).count())
    timed("membership (full)")(
      graft.derive.VulnerabilityV1.membership(spark, cp).count())
    spark.stop()
  }
}
