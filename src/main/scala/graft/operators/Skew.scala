package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skew-handling primitives (SURVEY §7.3 risk (e): hot purl groups like
  * the npm namespace dominate a partition at 100 TB).
  *
  * AQE's skew-join split covers joins; these cover the two shapes AQE does
  * not: skewed aggregation keys and skewed window partitions.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like aggregates over a skewed
    * key. Phase 1 aggregates on (key, salt) — spreading a hot key over
    * `salts` reducers — phase 2 merges the partials per key. Exact for
    * decomposable aggregates. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() +
        monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy("key")
      .agg(sum("_partial").as("cnt"))

  /** Salted distinct-count: exact countDistinct over a skewed group key.
    * Salt by the VALUE being counted (same value → same salt, so phase-1
    * distinct is globally correct), then sum per-salt distinct counts. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(abs(hash(value)), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(countDistinct(value).as("_partial"))
      .groupBy("key")
      .agg(sum("_partial").as("distinct_cnt"))

  /** Scale-safe global row numbering (the W7 alternative): a global
    * `row_number() over (order by ...)` is a single-partition sort, so at
    * scale we range-partition by the order key, sort within partitions,
    * and add per-partition offsets — identical output, no single-task
    * bottleneck. */
  def globalRowNumber(df: DataFrame, order: Column, numPartitions: Int = 32,
      outCol: String = "row_number"): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(numPartitions, order)
      .sortWithinPartitions(order)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(indexed,
      StructType(sorted.schema.fields :+ StructField(outCol, LongType)))
  }

  /** Skew-safe global top-k per key: per-partition top-k first (narrow),
    * then top-k of the union — the window never sees more than
    * partitions×k rows per key. */
  def topKPerKey(df: DataFrame, key: Column, order: Column, k: Int): DataFrame = {
    val byKey = Window.partitionBy(key, spark_partition_id())
      .orderBy(order.desc)
    val local = df.withColumn("_lrn", row_number().over(byKey))
      .filter(col("_lrn") <= k).drop("_lrn")
    val global = Window.partitionBy(key).orderBy(order.desc)
    local.withColumn("_grn", row_number().over(global))
      .filter(col("_grn") <= k)
      .withColumnRenamed("_grn", "rank")
  }
}
