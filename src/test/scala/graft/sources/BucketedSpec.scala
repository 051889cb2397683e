package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The bucketing contract: same key + same bucket count on both sides ⇒
  * the equi-join plans with NO shuffle under the join — the write paid
  * it. This is the physical-plan proof; result equality vs the raw
  * parquet goes through the sc5 oracle.
  */
class BucketedSpec extends AnyFunSuite with SparkTestSession {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    p +: inner.flatMap(allNodes)
  }

  private lazy val base: String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = (1 to 2000)
      .map(i => (i.toLong % 97, i.toLong, (i % 13) * 10.0))
      .toDF("cust_id", "order_id", "price")
    val customer = (0 until 97)
      .map(i => (i.toLong, s"seg${i % 5}")).toDF("cust_id", "segment")
    Bucketed.write(orders, "spec_buck_orders", s"$dir/orders",
      "cust_id", buckets = 4)
    Bucketed.write(customer, "spec_buck_customer", s"$dir/customer",
      "cust_id", buckets = 4)
    dir
  }

  test("bucketed-bucketed equi-join plans with no shuffle exchange") {
    base
    val o = Bucketed.table(spark, "spec_buck_orders")
    val c = Bucketed.table(spark, "spec_buck_customer")
    val joined = o.hint("merge").join(c, Seq("cust_id"))
      .select("cust_id", "order_id", "segment")
    joined.collect()
    val nodes = allNodes(joined.queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected a sort-merge join")
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"bucketed join shuffled: ${shuffles.map(_.nodeName).mkString(",")}")
  }

  test("bucketed join result matches the unbucketed join") {
    base
    val o = Bucketed.table(spark, "spec_buck_orders")
    val c = Bucketed.table(spark, "spec_buck_customer")
    val got = o.hint("merge").join(c, Seq("cust_id"))
      .select("order_id", "segment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val sp = spark
    import sp.implicits._
    val rawO = (1 to 2000)
      .map(i => (i.toLong % 97, i.toLong)).toDF("cust_id", "order_id")
    val rawC = (0 until 97)
      .map(i => (i.toLong, s"seg${i % 5}")).toDF("cust_id", "segment")
    val want = rawO.join(rawC, Seq("cust_id"))
      .select("order_id", "segment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == want)
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    base
    val o = Bucketed.table(spark, "spec_buck_orders")
    val agg = o.groupBy("cust_id").agg(sum("price").as("s"))
    agg.collect()
    val shuffles = allNodes(agg.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"bucketed agg shuffled: ${shuffles.map(_.nodeName).mkString(",")}")
  }

  test("equality filter on the bucket key prunes buckets") {
    base
    val o = Bucketed.table(spark, "spec_buck_orders")
    val scan = allNodes(
      o.filter(col("cust_id") === 7L).queryExecution.executedPlan)
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty)
    assert(scan.head.optionalBucketSet.exists(_.cardinality() == 1),
      "expected the scan to select exactly one bucket")
  }
}
