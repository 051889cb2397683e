package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FederatedCode-style export sink (SURVEY S7 + T2).
  *
  * Re-expresses pipes/export.py:137-176 + federate_vulnerabilities.py:
  * serialize each advisory to a YAML document, shard output by purl hash,
  * export incrementally past a checkpoint watermark. Spark-first shape:
  * the serialization is a column expression, the sharding is a partitioned
  * write (`partitionBy(shard)`) — no driver-side file loop, no git
  * subprocess (that boundary stays outside the engine).
  */
object FederatedExport {

  /** YAML scalar quoting (minimal: quotes strings with specials). */
  private def yamlQuote(c: org.apache.spark.sql.Column) =
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  /** Serialize advisories (derived schema with avid/aliases/summary/url)
    * into (shard, path, yaml) rows. Shard = first 2 hex of sha1(avid) —
    * the reference shards by purl hash to bound per-directory file counts
    * (pipes/export.py:137-176). */
  def serialize(advisories: DataFrame): DataFrame =
    advisories.filter(col("is_latest"))
      .select(
        substring(sha1(col("avid")), 1, 2).as("shard"),
        concat(substring(sha1(col("avid")), 1, 2), lit("/"),
          regexp_replace(col("avid"), "/", "_"), lit(".yml")).as("path"),
        concat(
          lit("advisory_id: "), yamlQuote(col("avid")), lit("\n"),
          lit("summary: "), yamlQuote(col("summary")), lit("\n"),
          lit("aliases:\n"),
          array_join(transform(array_sort(col("aliases")),
            a => concat(lit("  - "), a)), "\n"), lit("\n"),
          lit("url: "), yamlQuote(col("url")), lit("\n"),
          lit("risk_score: "),
          coalesce(col("risk_score").cast("string"), lit("null")), lit("\n"))
          .as("yaml"))

  /** Incremental selection past the export checkpoint (pipes/export.py:
    * 58-76): only advisories collected after the last run. */
  def changedSince(advisories: DataFrame, checkpoint: java.sql.Timestamp): DataFrame =
    advisories.filter(col("date_collected") >= lit(checkpoint))

  /** Write the export tree: one text file set per shard directory. */
  def write(serialized: DataFrame, outDir: String): Unit =
    serialized.select(col("shard"), col("yaml"))
      .write.mode("overwrite").partitionBy("shard").text(outDir)
}
