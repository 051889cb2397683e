package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.derive.AdvisoryDerive
import graft.operators.{Corpus, TextDedup}

/** Stage attribution for the two highest sublinear REHEARSAL_100X rows
  * of round 13 (d20_code_fixes 45.7×, x_contamination 43.0×) — the
  * IvfStageProbe pattern: time each stage of the benchmark query
  * separately over any testdata dir and print the volumes that decide
  * the hypothesis. Diagnostic tooling only.
  *
  * d20 hypothesis: the bench harness WRAPS the flat reference rows into
  * per-advisory `references` arrays (groupBy(avid).collect_list) only
  * for codeFixes to explode them straight back. The avid domain is
  * fixed at 50, so at 100× each synthetic advisory carries ~3M
  * references — a full-data shuffle into 50 collect_list groups that no
  * real corpus has (the reference iterates the FLAT AdvisoryReference
  * link table, v2_improvers/collect_commits.py:51) and the d20 oracle
  * never sees (it reads the flat rows too).
  *
  * x_contamination hypothesis: linear scan cost — corpus shingle
  * explode + the broadcast membership probe per shingle; the groupBy
  * combines map-side so the shuffle is tiny. If probe+shingle is the
  * bulk, the fix is narrowing the probe key (shingle strings → long
  * hashes) rather than any plan change.
  */
object FanoutStageProbe {
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
      println(f"[fanout] $n%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$rows%,d")
    }

    // ------------------------------------------------------ d20 stages
    val okey = col("o_orderkey")
    val commit = substring(md5(pmod(okey, lit(8)).cast("string")), 1, 8)
    val refs = Tables(spark, dir, "orders").select(
      concat(lit("adv/"), pmod(okey, lit(50))).as("avid"),
      when(pmod(okey, lit(4)) === 0,
        concat(lit("https://github.com/org/r"), pmod(okey, lit(7)),
          lit("/commit/"), commit))
        .when(pmod(okey, lit(4)) === 1,
          concat(lit("git://github.com/org/r"), pmod(okey, lit(7)),
            lit("/commit/"), commit))
        .when(pmod(okey, lit(4)) === 2,
          concat(lit("https://example.com/advisory/"), okey))
        .otherwise(lit("ftp://host/commit/deadbeef")).as("url"))
    val unfurled = Tables(spark, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"))

    timed("d20 stage 1: nest references") {
      refs.groupBy("avid")
        .agg(collect_list(struct(col("url"),
          lit("advisory").as("reference_type"),
          lit("").as("reference_id"))).as("references"))
        .withColumn("is_latest", lit(true)).count()
    }
    timed("d20 stage 2: unfurl distinct") {
      unfurled.filter(col("is_affected"))
        .select("avid", "base_purl", "version").distinct().count()
    }
    timed("d20 full: nested codeFixes") {
      val advisories = refs.groupBy("avid")
        .agg(collect_list(struct(col("url"),
          lit("advisory").as("reference_type"),
          lit("").as("reference_id"))).as("references"))
        .withColumn("is_latest", lit(true))
      AdvisoryDerive.codeFixes(advisories, unfurled).count()
    }
    timed("d20 alt: link-fed codeFixes") {
      AdvisoryDerive.codeFixesFromLinks(refs, unfurled).count()
    }

    // -------------------------------------------- contamination stages
    // same split as the x_contamination query (constant-size bench set)
    val d = Tables(spark, dir, "documents")
    val isBench = pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
    val corpus = d.filter(!isBench)
    val bench = d.filter(isBench)
    timed("cont stage 1: benchmark vocab") {
      TextDedup.shingles(bench, "text", "doc_id", 3)
        .select("shingle").distinct().count()
    }
    timed("cont stage 2: corpus shingles") {
      TextDedup.shingles(corpus, "text", "doc_id", 3).count()
    }
    timed("cont full: contamination") {
      Corpus.contamination(corpus, bench, "text", "doc_id", n = 3).count()
    }
    spark.stop()
  }
}
