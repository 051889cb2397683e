package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The severity-source weight table: reference-URL domain → weight 0–10.
  *
  * The reference ships this as a ~2,900-entry literal dict
  * (vulnerabilities/weight_config.py:10-2912, Apache-2.0 public data)
  * consulted per severity row at risk-scoring time (risk.py:46). Here it
  * is DATA, not code: a classpath TSV resource loaded once per JVM, used
  * either as a driver-side map (for the scalar [[Risk.weightedSeverity]])
  * or as a broadcast dimension DataFrame (for the set-oriented
  * [[graft.derive.AdvisoryDerive.advisoryRisk]] join — ~2,900 narrow rows
  * broadcast to every executor, never shuffled).
  *
  * Scale shape: the dimension is O(3k) rows forever (it grows with
  * distinct advisory-source domains, not with advisories), so a broadcast
  * hash join against a 100 TB severity fact is the terminal plan — the
  * fact side never moves.
  */
object SeverityWeights {

  private val ResourcePath = "/graft/severity_weights.tsv"

  /** domain → weight, loaded once per JVM from the bundled resource. */
  lazy val map: Map[String, Int] =
    TsvResource.load(ResourcePath)((k, v) => k -> v.trim.toInt)

  /** The table as a (domain, weight) DataFrame for broadcast joins. */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    map.toSeq.sortBy(_._1).toDF("domain", "weight")
  }
}
