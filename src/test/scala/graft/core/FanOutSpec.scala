package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** FanOut must key on the scan's *packed-partition* estimate, not file
  * count: many tiny files bin-pack into few tasks (need fan-out even
  * though files ≥ cores), while one large splittable file yields plenty
  * of partitions (repartition would only shrink them). */
class FanOutSpec extends AnyFunSuite with SparkTestSession {

  test("small in-memory input fans out to defaultParallelism") {
    val sp = spark
    import sp.implicits._
    val out = FanOut((1 to 100).toDF("x"))
    assert(out.rdd.getNumPartitions == sp.sparkContext.defaultParallelism)
  }

  test("many tiny bin-packed files still fan out") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("fanout-many").toString
    // 8 files (≥ the 4-core test parallelism) of a few rows each: the
    // old files>=cores guard skipped the repartition here although the
    // scan bin-packs these into fewer tasks than cores.
    (1 to 64).toDF("x").repartition(8).write.mode("overwrite").parquet(dir)
    val df = sp.read.parquet(dir)
    assert(df.inputFiles.length >= sp.sparkContext.defaultParallelism)
    val out = FanOut(df)
    assert(out.rdd.getNumPartitions == sp.sparkContext.defaultParallelism)
  }

  test("scan whose byte estimate already covers the cores is untouched") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("fanout-big").toString
    (1 to 20000).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    val df = sp.read.parquet(dir)
    // shrink the split size so this single file *estimates* to ≥ cores
    // partitions — the stand-in for a genuinely large splittable file
    val prev = sp.conf.get("spark.sql.files.maxPartitionBytes")
    sp.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try assert(FanOut(df) eq df) // no-op: the scan supplies parallelism
    finally sp.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
