package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Idempotent upsert semantics as batch recomputation (SURVEY S8).
  *
  * The reference's row-at-a-time writers (get_or_create /
  * update_or_create / bulk_create ignore_conflicts / confidence-max
  * update, models.py:1217-1249, models.py:3624-3650) become set-level
  * merges: deterministic, restartable, and one shuffle each.
  */
object Upserts {

  /** MERGE keeping the higher-confidence row per natural key
    * (models.py:1217-1249: "upsert keeps the higher-confidence row"),
    * ties broken toward the existing row. */
  def confidenceMax(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], confidenceCol: String = "confidence"): DataFrame = {
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(confidenceCol).desc, col("_src").asc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** One row per natural key WITHIN a batch: the reference's writers
    * process rows sequentially under a unique constraint, so an incoming
    * batch that carries the same key twice (the same (vcs_url, commit)
    * harvested twice in one run) still yields ONE stored row. Set-level
    * merges must enforce that explicitly or the one-row-per-key
    * invariant every downstream join/window assumes silently breaks.
    * Deterministic pick: the row whose full non-key tuple sorts first
    * (there is no arrival order in a batch to replay). */
  private def onePerKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(keys.contains).map(col).toSeq
    if (rest.isEmpty) df.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(struct(rest: _*).asc)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** bulk_create(ignore_conflicts=True): keep existing rows, add only
    * new-keyed incoming rows (one per key — see [[onePerKey]]). */
  def insertIgnoreConflicts(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.unionByName(
      onePerKey(incoming, keys)
        .join(existing.select(keys.map(col): _*).distinct(),
          keys, "left_anti"))

  /** update_or_create: incoming replaces same-keyed existing rows (one
    * per key — see [[onePerKey]]). */
  def updateOrCreate(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    onePerKey(incoming, keys).unionByName(
      existing.join(incoming.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))
}
