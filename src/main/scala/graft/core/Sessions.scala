package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical session settings for the engine. Applied by Verify/Bench/tests;
  * a production cluster deploy would set the same keys in spark-defaults.
  */
object Sessions {

  /** Engine-required + scale-oriented session configs:
    *   - nanosAsLong: read parquet TIMESTAMP(NANOS) (events table);
    *   - AQE on (runtime coalescing, skew-join split — the 100 TB path);
    *   - partition sizing tuned so local[32] ≈ one partition per core while
    *     cluster runs inherit sane file-split sizes.
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def local(appName: String, cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = configure(SparkSession.builder().appName(appName).master(s"local[$cpus]"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
