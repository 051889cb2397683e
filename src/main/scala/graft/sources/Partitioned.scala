package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — the filter-side complement to
  * [[Bucketed]] (which serves the join side).
  *
  * Writing a corpus partitioned by its dominant filter columns (source,
  * ingest date, language) turns those filters into DIRECTORY pruning: an
  * equality or range predicate on a partition column never opens a
  * non-matching file, so `WHERE source = 'x'` on a 100 TB corpus reads
  * only that source's fraction — the scan's `PartitionFilters` line, not
  * its `PushedFilters` line, which is row-group-level and still lists
  * every file. The reference leans on DB indexes for the same access
  * paths (vulnerablecode models.py:905-918, 3308-3318); a lake engine
  * gets them from layout.
  *
  * Partition columns should be LOW-cardinality (each value is a
  * directory; a high-cardinality partition column is the classic
  * small-files trap — that is what [[Bucketed]] buckets are for).
  * `maxRecordsPerFile` bounds the other failure mode, one giant file per
  * partition value.
  */
object Partitioned {

  /** Write `df` partitioned by `cols` at `path` (overwrite). */
  def write(df: DataFrame, path: String, cols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(cols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)
  }

  /** Read the layout back; partition columns come from directory names
    * (their values never occupy bytes in the files). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
