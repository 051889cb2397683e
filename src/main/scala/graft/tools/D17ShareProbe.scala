package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Pure-path vs general-path ROW SHARE for
  * d17_valid_version_inferences at scale — the round-16 verdict's
  * remaining d17 question: the measured stage split said compute
  * (68.8 s of 113.4 at 100×) dominates, so the next lever (if any)
  * would be extending `vers_pure_bounds_native` to single-exclusion
  * specs — but only if the GENERAL window path actually carries a
  * material share of the fan-out rows. This probe counts, on the
  * bench corpus at the given scale dir:
  *   - ranged impact rows whose spec parses PURE vs GENERAL
  *     (`vers_pure_bounds_native(spec).pure`), and
  *   - the post-fan-out (impact × version) row share of each branch —
  *     the rows the window walk would actually process.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.D17ShareProbe
  *        [dataDir=/tmp/sf10]
  */
object D17ShareProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the d17 bench query's EXACT synthetic impacts/versions
    // construction (DedupGroupQueries d17) — kept in lockstep
    val akey = pmod(col("o_orderkey"), lit(30))
    val lo = pmod(col("o_orderkey"), lit(3)) + 1
    val impacts = Tables(spark, dir, "orders").select(
      concat(lit("adv/"), akey).as("avid"),
      lit("npm").as("ptype"), lit("").as("namespace"),
      concat(lit("q"), when(pmod(akey, lit(2)) === 0, pmod(akey, lit(10)))
        .otherwise(pmod(col("o_custkey"), lit(10)))).as("name"),
      when(pmod(col("o_orderkey"), lit(4)) === 0, lit(null))
        .otherwise(concat(lit("vers:generic/>="), lo, lit("|<="),
          lo + 3)).as("affecting_vers"))
    val versions = Tables(spark, dir, "part").select(
      lit("npm").as("ptype"), lit("").as("namespace"),
      concat(lit("q"), pmod(col("p_partkey"), lit(10))).as("name"),
      (pmod(col("p_partkey"), lit(8)) + 1).cast("string").as("version"))
      .distinct()

    val ranged = impacts.filter(col("affecting_vers").isNotNull &&
        length(col("affecting_vers")) > 0)
      .withColumn("_pure",
        call_function("vers_pure_bounds_native",
          col("affecting_vers")).getField("pure"))
    val impactShare = ranged.groupBy("_pure").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val fanShare = ranged
      .join(versions, Seq("ptype", "namespace", "name"))
      .groupBy("_pure").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    def pct(m: Map[Boolean, Long]): String = {
      val p = m.getOrElse(true, 0L); val g = m.getOrElse(false, 0L)
      val tot = (p + g).max(1L)
      f"pure=$p (${100.0 * p / tot}%.1f%%) general=$g (${100.0 * g / tot}%.1f%%)"
    }
    println(s"[d17share] dir=$dir ranged impacts: ${pct(impactShare)}")
    println(s"[d17share] post-fanout rows:       ${pct(fanShare)}")
    spark.stop()
  }
}
