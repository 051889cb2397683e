package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryModule, Tables}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names are keyed to the SURVEY.md §2 operator inventory; each module
  * documents the reference file:line it re-expresses Spark-first.
  */
object SparkEntry {

  /** All registered operator modules. Order is stable (drives Bench order). */
  val modules: Seq[QueryModule] = Seq(
    ProjectionFilterQueries,
    JoinQueries,
    AggregationQueries,
    WindowSetQueries,
    VersionQueries,
    ScalarFunctionQueries,
    DedupGroupQueries,
    TextAnalysisQueries,
    TextDedupQueries,
    BpeQueries,
    SimilarityQueries,
    MultimodalQueries,
    CorpusQueries,
    QualityClassifierQueries,
    CurationSinkQueries,
    TrainingPipelineQueries,
    StreamingQueries,
    ServingQueries,
    V1Queries,
    ExportQueries,
    ScaleQueries,
    IngestQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped: segment-filtered customers × orders × lineitem,
    * revenue per order, top 10 — exercises broadcast join, partial agg,
    * and top-k sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.entries.map(e => e.name -> e.build)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.entries.flatMap(e => e.oracle.map(e.name -> _))).toMap
}
