package graft.sources

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The partition-pruning contract: a filter on a partition column must
  * reach the scan as a PartitionFilter and cut the files read, not just
  * the rows returned.
  */
class PartitionedSpec extends AnyFunSuite with SparkTestSession {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    p +: inner.flatMap(allNodes)
  }

  private lazy val path: String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("partd").toString
    val docs = (1 to 900).map { i =>
      (i.toLong, s"src${i % 3}", if (i % 2 == 0) "en" else "fr", s"text $i")
    }.toDF("doc_id", "source", "lang", "text")
    Partitioned.write(docs, s"$dir/docs", Seq("source", "lang"))
    s"$dir/docs"
  }

  test("a partition-column filter prunes to the matching directories") {
    val df = Partitioned.read(spark, path)
      .filter(col("source") === "src1" && col("lang") === "en")
      .select("doc_id")
    assert(df.count() == 150)
    val scan = allNodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scan.nonEmpty)
    val meta = scan.head.metadata
    assert(meta("PartitionFilters").contains("source"),
      s"filter did not reach PartitionFilters: ${meta("PartitionFilters")}")
    // of the 3x2 partition directories, exactly one survives pruning
    assert(scan.head.relation.location
      .listFiles(scan.head.partitionFilters, Nil).length == 1,
      "expected exactly one partition directory after pruning")
  }

  test("round-trips rows and keeps partition values out of data files") {
    val back = Partitioned.read(spark, path)
    assert(back.count() == 900)
    assert(back.schema.fieldNames.toSet ==
      Set("doc_id", "source", "lang", "text"))
    val firstFile = new java.io.File(s"$path/source=src0/lang=en")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val raw = spark.read.parquet(firstFile.getAbsolutePath)
    assert(!raw.schema.fieldNames.contains("source"))
  }
}
