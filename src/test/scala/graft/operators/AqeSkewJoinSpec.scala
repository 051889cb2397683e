package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ADAPTIVE half of the skew story ([[Skew.saltedJoin]] is the
  * pre-emptive half): Sessions.configure turns AQE's skew-join split on,
  * and this spec proves the runtime re-plan actually fires — a hot key's
  * oversized shuffle partition is split by OptimizeSkewedJoin
  * (SortMergeJoin(skew=true)) with byte-identical join output. Salting
  * remains the tool for the shapes AQE cannot fix (first-pass shuffles,
  * aggregations); this covers the join shape users hit most.
  */
class AqeSkewJoinSpec extends AnyFunSuite with SparkTestSession {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    p +: inner.flatMap(allNodes)
  }

  test("AQE splits the hot key's partition in a sort-merge join") {
    val sp = spark
    import sp.implicits._
    val confKeys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = confKeys.map(k => k -> sp.conf.getOption(k)).toMap
    val dir = java.nio.file.Files.createTempDirectory("aqeskew").toString
    try {
      // thresholds scaled down so a test-sized hot key trips the same
      // detection a multi-GB partition would on a cluster
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      sp.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      sp.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // key 0 carries ~20k wide rows; 40 other keys a handful each
      val fact = ((1 to 20000).map(i => (0L, s"payload-$i-" + "x" * 60)) ++
        (1 to 200).map(i => (i.toLong % 40 + 1, s"small-$i")))
        .toDF("k", "payload")
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      val dim = (0 to 40).map(i => (i.toLong, s"dim-$i")).toDF("k", "name")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      val joined = sp.read.parquet(s"$dir/fact")
        .join(sp.read.parquet(s"$dir/dim"), Seq("k"))
      // collect() finalizes THIS dataframe's AdaptiveSparkPlanExec;
      // count() would execute a different QueryExecution and leave this
      // one's skew decision unmade
      assert(joined.collect().length == 20200)
      val exec = joined.queryExecution.executedPlan
      val smj = allNodes(exec).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$exec")
      assert(smj.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire:\n${smj.head}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => sp.conf.set(k, v)
        case (k, None)    => sp.conf.unset(k)
      }
    }
  }
}
