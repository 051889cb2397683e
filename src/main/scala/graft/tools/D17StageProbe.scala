package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Stage split for d17_valid_version_inferences' 100× noop spot — the
  * round-15 verdict's ask: the 152.7 s reading was attributed ~60% to
  * "output materialization + the deterministic orderBy", but per the
  * memory-file discipline a sort hypothesis must be MEASURED with a
  * no-global-sort twin, not assumed (EliminateSorts removed the sort
  * under count-mode, so no prior artifact ever actually timed it).
  *
  * Four probe points, all full-column noop consumption (the bench
  * methodology), 2 reps each, warm rep read:
  *   1. core noop, NO sort            -> compute + materialize
  *   2. core.count(), NO sort         -> compute only (count-mode
  *      caveat: aggregate expressions may prune; lower bound)
  *   3. core + sortWithinPartitions   -> adds the per-partition sort
  *   4. bench shape (global orderBy)  -> adds range exchange + merge
  * The {compute, sort, materialize} split is then
  *   compute ≈ (2), materialize ≈ (1) − (2),
  *   local sort ≈ (3) − (1), global-sort extra ≈ (4) − (3).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.D17StageProbe
  *        [dataDir=/tmp/sf100x]
  */
object D17StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf100x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cold(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def timed(n: String)(f: => Unit): Double = {
      val ts = (1 to 2).map { _ =>
        cold()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val warm = ts.min
      println(f"[d17] $n%-44s reps=${ts.map(t => f"$t%.2f").mkString("/")}" +
        f"  warm=$warm%7.2f s")
      warm
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // window-speed canary (Bench.scala discipline, same constant work)
    timed("canary (400M xxhash64 bit_xor)") {
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
    }

    // the d17 bench fixture, exactly as DedupGroupQueries builds it
    def t(n: String) = Tables(spark, dir, n)
    val akey = pmod(col("o_orderkey"), lit(30))
    val lo = pmod(col("o_orderkey"), lit(3)) + 1
    val impacts = t("orders").select(
      concat(lit("adv/"), akey).as("avid"),
      lit("npm").as("ptype"), lit("").as("namespace"),
      concat(lit("q"), when(pmod(akey, lit(2)) === 0, pmod(akey, lit(10)))
        .otherwise(pmod(col("o_custkey"), lit(10)))).as("name"),
      when(pmod(akey, lit(2)) === 0, lit("distro=a"))
        .otherwise(concat(lit("distro=d"),
          pmod(col("o_custkey"), lit(2)))).as("qualifiers"),
      when(pmod(col("o_orderkey"), lit(4)) === 0, lit(null))
        .otherwise(concat(lit("vers:generic/>="), lo, lit("|<="),
          lo + 3)).as("affecting_vers"),
      when(pmod(col("o_orderkey"), lit(4)).isin(0, 1),
        (lo + 4).cast("string")).as("fixed_version"))
    val versions = t("part").select(
      lit("npm").as("ptype"), lit("").as("namespace"),
      concat(lit("q"), pmod(col("p_partkey"), lit(10))).as("name"),
      (pmod(col("p_partkey"), lit(8)) + 1).cast("string").as("version"))
      .distinct()
    def core() = graft.derive.Improvers
      .validVersionInferences(impacts, versions)
      .select(col("avid"), col("name"), col("qualifiers").as("quals"),
        concat_ws(",", col("affected_versions")).as("affected"),
        col("fixed_version").as("fixed"), col("confidence"))
    val sortCols = Seq("avid", "name", "quals", "affected", "fixed")

    val tCount = timed("core count(), no sort (compute floor)") {
      core().count(); ()
    }
    val tNoop = timed("core noop, NO sort (compute+materialize)") {
      noop(core())
    }
    val tLocal = timed("core + sortWithinPartitions, noop") {
      noop(core().sortWithinPartitions(sortCols.map(col): _*))
    }
    val tFull = timed("bench shape: global orderBy, noop") {
      noop(graft.SparkEntry
        .queries("d17_valid_version_inferences")(spark, dir))
    }
    println(f"[d17] split: compute≈$tCount%.1f  " +
      f"materialize≈${tNoop - tCount}%.1f  " +
      f"localSort≈${tLocal - tNoop}%.1f  " +
      f"globalSortExtra≈${tFull - tLocal}%.1f  (of full $tFull%.1f)")
    spark.stop()
  }
}
