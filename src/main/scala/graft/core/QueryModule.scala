package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark build function over the testdata
  * tables in `dir`, plus (when SQL-expressible) an equivalent DuckDB oracle
  * SQL. Names are stable and keyed to the SURVEY.md §2 operator inventory
  * (p* = projections/filters, j* = joins, a* = aggregations, w* = windows,
  * so* = set ops, f* = scalar functions, v* = version-range ops, d* = dedup/
  * grouping, t* = incremental, x* = training-data ops).
  */
final case class QueryEntry(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame,
)

trait QueryModule {
  def entries: Seq[QueryEntry]

  protected def q(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, Some(oracle.stripMargin.trim), build)

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  protected def qNoOracle(name: String)(
      build: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, None, build)
}
