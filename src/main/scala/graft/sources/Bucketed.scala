package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the co-located join path.
  *
  * A shuffle join on two 10 TB fact tables moves both sides across the
  * cluster every time the join runs. Bucketing pays that shuffle ONCE at
  * write time: each side is hash-partitioned into `buckets` files by the
  * join key and sorted within each bucket, and Spark's catalog records
  * the layout (`HashPartitioning` output partitioning + sort order). A
  * later equi-join of two tables bucketed by the same key into the same
  * bucket count plans as a sort-merge join with NO Exchange and NO Sort
  * on either side — bucket i joins bucket i, locally. The same layout
  * also serves bucket pruning (an equality filter on the bucket key
  * reads 1/`buckets` of the files) and shuffle-free aggregation on the
  * bucket key.
  *
  * This is the batch analog of the reference's per-source upsert tables
  * keyed by avid (vulnerablecode models.py:3123-3367 `unique_content_id`
  * / avid keys): repeated derive runs re-join advisory facts on the same
  * key every time, which is exactly when pre-bucketing amortizes.
  *
  * Tables are registered in the session catalog as EXTERNAL tables (an
  * explicit filesystem `path`), so the warehouse directory is never
  * involved and the parquet stays where the caller put it. Bucket files
  * are plain parquet readable by any engine — only the bucket *metadata*
  * lives in the catalog.
  */
object Bucketed {

  /** Write `df` as a parquet table bucketed (and sorted) by `key` into
    * `buckets` buckets at `path`, registered as `table`. Overwrites both
    * the catalog entry and the files. One shuffle now; co-located joins
    * and aggs on `key` forever after. */
  def write(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite")
      .format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** The bucketed table, with its layout metadata (bucket spec) attached
    * — joins/aggs on the bucket key skip their Exchange. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
