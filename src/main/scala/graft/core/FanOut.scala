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
    // Key on the leaf scan's file count rather than `df.rdd.getNumPartitions`:
    // the `.rdd` probe forced an extra physical-plan compile per call site.
    // A scan yields at least one partition per file, so `files >= cores`
    // already guarantees the map phase saturates; a 100 TB table (thousands
    // of files) short-circuits here and never shuffles. Non-file inputs
    // (in-memory test frames) report 0 files and take the bounded
    // small-input repartition, which is the safe direction.
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
