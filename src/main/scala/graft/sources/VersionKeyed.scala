package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{call_function, col, lit}
import org.apache.spark.sql.types.MetadataBuilder

/** Version-keyed parquet layout — the scan-pruning path for version
  * ranges.
  *
  * A version-range predicate (`version_in_range(v, 'vers:…')`) is opaque
  * to every storage engine: the scan must read and decode EVERY row's
  * version string before the filter can run. The engine's version
  * ordering, however, is a total order realized as a sortable STRING key
  * (graft.functions.VersionOrd.sortKey — the same key every comparison
  * path uses), and plain string bounds ARE pushable: parquet keeps
  * min/max statistics per row group and the reader skips whole row
  * groups outside the bounds.
  *
  * So the layout materializes the sort key next to the version column at
  * WRITE time — paying the key computation once per row at ingest, like
  * the reference stores normalized/sortable version forms on its
  * affected-version rows rather than re-deriving them per query
  * (models.py AffectedByPackageRelatedVulnerability version fields).
  * The key column is self-describing: its column METADATA records which
  * version column it keys and under which scheme
  * (`graft.vkey.of` / `graft.vkey.scheme`), and Spark round-trips that
  * metadata through the parquet footer. [[graft.expr
  * .MaterializedVersionKeyRewrite]] reads it to substitute sort-key
  * computations with the stored column — turning a constant version-range
  * filter into parquet-pushable string bounds with row-group skipping.
  * Sorting the write by the key clusters ranges into few row groups, so
  * the min/max skip actually prunes instead of matching every group.
  */
object VersionKeyed {

  val OF_KEY = "graft.vkey.of"
  val SCHEME_KEY = "graft.vkey.scheme"

  def vkeyName(versionCol: String): String = s"${versionCol}_vkey"

  /** Write `df` with a materialized, metadata-tagged sort-key column for
    * `versionCol` under `scheme`, sorted by the key so range predicates
    * prune row groups. */
  def write(df: DataFrame, versionCol: String, scheme: String,
      path: String): Unit = {
    val meta = new MetadataBuilder()
      .putString(OF_KEY, versionCol)
      .putString(SCHEME_KEY, scheme)
      .build()
    df.withColumn(vkeyName(versionCol),
        call_function("version_sort_key_native", lit(scheme), col(versionCol))
          .as(vkeyName(versionCol), meta))
      .sortWithinPartitions(vkeyName(versionCol))
      .write.mode("overwrite").parquet(path)
  }

  /** Read a version-keyed layout; the vkey column arrives with its
    * metadata, so the rewrite rule activates with no caller hints. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
