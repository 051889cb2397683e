package graft.core

import org.apache.spark.sql.DataFrame

/** Small-scan fan-out: redistribute a DataFrame before compute-heavy
  * per-row work (hashing, shingling, signature passes) when the scan
  * supplies fewer partitions than the cluster has cores.
  *
  * Why: Spark parallelizes a parquet scan at row-group granularity, so a
  * small or single-row-group file yields ONE task and a compute-bound map
  * phase (e.g. 16 md5 min-hashes per shingle) serializes on one core no
  * matter how many are available. At production scale (a 100 TB table is
  * thousands of splits) the guard is false and this is a no-op — the scan
  * itself supplies the parallelism, and a blind `repartition` there would
  * be a full-corpus shuffle. The shuffle this does pay in the small case
  * is bounded by the small input itself.
  *
  * Row-level results are unchanged: round-robin redistribution feeds
  * aggregations/joins whose outputs are partitioning-independent.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
