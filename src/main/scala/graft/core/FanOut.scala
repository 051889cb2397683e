package graft.core

import org.apache.spark.sql.DataFrame

/** Small-scan fan-out: redistribute a DataFrame before compute-heavy
  * per-row work (hashing, shingling, signature passes) when the scan
  * supplies fewer partitions than the cluster has cores.
  *
  * Why: Spark parallelizes a parquet scan at row-group granularity, so a
  * small or single-row-group file yields ONE useful task and a
  * compute-bound map phase (e.g. 16 md5 min-hashes per shingle)
  * serializes on one core no matter how many are available. At
  * production scale the guard is false and this is a no-op — the scan
  * itself supplies the parallelism, and a blind `repartition` there
  * would be a full-corpus shuffle. The shuffle this does pay in the
  * small case is bounded by the small input itself.
  *
  * The guard estimates the scan's packed-partition count from plan-stats
  * bytes over `maxPartitionBytes` — NOT from `inputFiles.length`, which
  * is wrong in both directions: Spark bin-packs many small files into
  * few FilePartitions (files ≥ cores can still mean one task per core is
  * impossible), and one large splittable file (files = 1) already yields
  * plenty of partitions that a `repartition(target)` would *collapse*.
  * Byte-based estimation gets both right: thousands of tiny files →
  * few estimated partitions → fan out; one 10 GB parquet → ~80 estimated
  * partitions → no-op. Plan stats for file relations are the real
  * listed file bytes (no extra FS calls); for in-memory test frames they
  * are small, which lands on the bounded small-input repartition — the
  * safe direction. Avoids the `.rdd` probe, which forced an extra
  * physical-plan compile per call site.
  *
  * Row-level results are unchanged: round-robin redistribution feeds
  * aggregations/joins whose outputs are partitioning-independent.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit =
      math.max(spark.sessionState.conf.filesMaxPartitionBytes, 1L)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estParts = (estBytes + maxSplit - 1) / maxSplit
    if (estParts < target) df.repartition(target) else df
  }
}
