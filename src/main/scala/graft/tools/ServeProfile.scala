package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.serve.Serving

/** Serving-latency profile: replay the s9–s18b queryset family as an API
  * server would — marts built and cached ONCE, then many small
  * parameterized requests against them — and report per-request p50/p95.
  *
  * This is a different contract than Bench: Bench measures each query
  * cold (scan + derive + answer) because that is the driver's per-query
  * gate; a serving tier amortizes the scan into a cached mart and each
  * REQUEST is a broadcast-semi-join / index-ish probe over it. The
  * numbers this main emits are the evidence that the serving plans
  * (bounded request broadcast, seek pagination, search cascade) hold
  * interactive latency — at production scale the marts live in the
  * cluster's memory/SSD tier and the same plans apply per request.
  *
  * Usage: runMain graft.tools.ServeProfile [sfDir] — prints one JSON line
  * with {endpoint: {p50_ms, p95_ms, max_ms, n}} (recorded in BASELINE.md).
  */
object ServeProfile {

  /** Nearest-rank percentile: ceil(p·n)-th smallest. The previous
    * `(p·n).toInt` indexing was one rank high (p50 of 40 reps read the
    * 21st sample — the 52.5th percentile), i.e. pessimistic. */
  private def pct(sorted: Array[Double], p: Double): Double =
    sorted(math.max(0,
      math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "40").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- marts, built once and pinned (the serving tier's steady state)
    val unfurled = Tables(spark, sfDir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed")).cache()
    val advisories = Tables(spark, sfDir, "orders").select(
      concat(lit("ADV-"), col("o_orderkey")).as("advisory_id"),
      array(concat(lit("CVE-2020-"), col("o_custkey")),
        concat(lit("GHSA-"), pmod(col("o_orderkey"), lit(97))))
        .as("aliases"),
      array(struct(
        concat(lit("REF-"), pmod(col("o_orderkey"), lit(31)))
          .as("reference_id"))).as("references"),
      concat(col("o_orderpriority"), lit(" order "), col("o_orderkey"))
        .as("summary"),
      lit(true).as("is_latest")).cache()
    val advisoriesByAvid = unfurled.select("avid").distinct()
      .withColumn("is_latest", lit(true)).cache()
    val packages = Tables(spark, sfDir, "part").select(
      concat(lit("pkg:npm/p"), pmod(col("p_partkey"), lit(20)), lit("@"),
        pmod(col("p_partkey"), lit(9))).as("package_url")).cache()
    val patchLinks = Tables(spark, sfDir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      when(pmod(col("l_linenumber"), lit(2)) === 0, "fixed")
        .otherwise("introduced").as("patch_kind"),
      md5(concat(lit("c"), col("l_suppkey"))).as("commit_hash"),
      concat(lit("https://github.com/org/r"),
        pmod(col("l_suppkey"), lit(30))).as("vcs_url")).cache()
    Seq(unfurled, advisories, advisoriesByAvid, packages, patchLinks)
      .foreach(_.count()) // materialize the caches before timing anything

    // ---- parameterized requests: rotate the lookup keys per request so
    // no per-plan/JIT cache can answer from a previous request
    def purlsReq(i: Int): DataFrame =
      Seq(
        (s"pkg:npm/p${i % 20}", s"${1 + i % 7}"),
        (s"pkg:npm/p${(i + 7) % 20}", s"${1 + (i + 3) % 7}"),
        (s"pkg:npm/p${(i + 13) % 20}", s"${1 + (i + 5) % 7}"))
        .toDF("base_purl", "version")
    val searchTerms =
      Array("cve-2020-11", "urgent", "ghsa-9", "adv-10", "ref-7", "order 42")

    val endpoints: Seq[(String, Int => DataFrame)] = Seq(
      "s9_affecting_bulk" -> (i =>
        Serving.advisoriesForPurls(advisoriesByAvid, unfurled, purlsReq(i),
          "affecting")),
      "s9_purl_pairs" -> (i =>
        Serving.advisoryPurlPairs(unfurled, purlsReq(i), "both")),
      "bulk_lookup" -> (i => Serving.bulkLookup(unfurled, purlsReq(i))),
      "s16_patches_bulk" -> (i =>
        Serving.patchesBulk(patchLinks,
          Seq(s"pkg:npm/p${i % 20}", s"pkg:npm/p${(i + 9) % 20}")
            .toDF("base_purl"),
          Seq(s"adv/${i % 50}", s"adv/${(i + 17) % 50}").toDF("avid"))),
      "s17_search_advisories" -> (i =>
        Serving.searchAdvisories(advisories,
          searchTerms(i % searchTerms.length))),
      "s18_search_packages" -> (i =>
        Serving.searchPackages(packages, s"pkg:npm/p${i % 20}@${i % 9}")),
      "w6b_keyset_page" -> (i =>
        Serving.pageAfter(packages, "package_url",
          Some(s"pkg:npm/p${i % 20}"), 25)))

    val results = endpoints.map { case (name, build) =>
      build(0).collect() // warm: JIT + broadcast machinery, not measured
      val lat = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        build(i).collect()
        (System.nanoTime() - t0) / 1e6
      }.toArray.sorted
      name -> (pct(lat, 0.50), pct(lat, 0.95), lat.last)
    }

    spark.stop()
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val body = results.map { case (n, (p50, p95, mx)) =>
      s""""$n":{"p50_ms":${f(p50)},"p95_ms":${f(p95)},"max_ms":${f(mx)},"n":$reps}"""
    }.mkString(",")
    println(s"""{"profile":"serving","sf":"$sfDir",$body}""")
    System.out.flush()
  }
}
