package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Scale-rehearsal data generator: blow an existing testdata SF up by an
  * integer factor by unioning key-shifted copies — fact keys move by a
  * fixed stride per copy so referential joins stay consistent and every
  * copy is a disjoint replica of the original's join/graph structure
  * (what a real 10× corpus looks like to the partitioner: same skew
  * profile, more of it). Dimension tables (region/nation) are shared.
  *
  * Strides are multiples of every modulus the bench queries use
  * (% 7/10/20/50/100), so the per-copy selected fraction matches the
  * original and results scale linearly by construction.
  *
  * Usage: runMain graft.tools.ScaleGen <inDir> <outDir> <factor>
  * Output goes OUTSIDE the read-only testdata tree (e.g. /tmp/sf1gen).
  */
object ScaleGen {

  private val OrderStride = 700000000L
  private val PartStride = 7000000L
  private val SuppStride = 7000000L
  private val CustStride = 7000000L
  private val EventStride = 700000000L
  private val DocStride = 7000000L

  private val shifts: Map[String, Seq[(String, Long)]] = Map(
    "orders" -> Seq("o_orderkey" -> OrderStride, "o_custkey" -> CustStride),
    "lineitem" -> Seq("l_orderkey" -> OrderStride, "l_partkey" -> PartStride,
      "l_suppkey" -> SuppStride),
    "part" -> Seq("p_partkey" -> PartStride),
    "customer" -> Seq("c_custkey" -> CustStride),
    "supplier" -> Seq("s_suppkey" -> SuppStride),
    "events" -> Seq("event_id" -> EventStride, "user_id" -> CustStride),
    "documents" -> Seq("doc_id" -> DocStride),
    "embeddings" -> Seq("vec_id" -> DocStride),
    "nation" -> Seq.empty,
    "region" -> Seq.empty)

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      val base = Tables(spark, inDir, t)
      val sh = shifts(t)
      val out =
        if (sh.isEmpty || factor == 1) base
        else (0 until factor).map { i =>
          sh.foldLeft(base) { case (df, (c, stride)) =>
            df.withColumn(c, (col(c) + lit(stride * i)).cast(
              base.schema(c).dataType))
          }
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t -> $outDir/$t.parquet")
    }
    spark.stop()
  }
}
