package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: runs SparkEntry.entry (flagship sf0.001 query) and prints
  * the rows — mirrors the driver's rows>0 check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-smoke", "8")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    rows.foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] rows=${rows.length}")
    spark.stop()
  }
}
