package graft
import org.apache.spark.sql.functions._
object CCDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("cc-debug", "32")
    val dir = "/root/testdata/sf0.1"
    val edges = graft.core.Tables(spark, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val t0 = System.nanoTime()
    val cc = graft.operators.ConnectedComponents.labelPropagation(spark, edges)
    val n = cc.select("component").distinct().count()
    println(s"[ccdebug] components=$n time=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
