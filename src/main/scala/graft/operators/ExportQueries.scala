package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.export.FederatedExport

/** SURVEY §2 S7 driver-oracle coverage — the federated export run
  * through the REAL serialize/packageIndex paths over synthetic
  * advisories, with DuckDB re-deriving the sharding (sha256 prefix) and
  * the structural document columns. The YAML bodies themselves are
  * golden-file-pinned in FederatedExportSpec (a string the oracle
  * cannot cheaply re-render); the oracle checks paths, shards, and
  * every per-document collection cardinality, so a dropped impact or
  * severity list still fails the gate. */
object ExportQueries extends QueryModule {

  private def advisories(s: SparkSession, dir: String): DataFrame = {
    val sevType = "array<struct<scoring_system:string,value:string," +
      "scoring_elements:string,url:string>>"
    val refType = "array<struct<url:string,reference_type:string," +
      "reference_id:string>>"
    Tables(s, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(300)).as("k")).distinct()
      .select(
        concat(lit("exp/"), col("k")).as("avid"),
        concat(lit("E-"), col("k")).as("advisory_id"),
        lit(true).as("is_latest"),
        concat(lit("sum "), col("k")).as("summary"),
        concat(lit("https://u/"), col("k")).as("url"),
        array(concat(lit("CVE-"), col("k"))).as("aliases"),
        when(pmod(col("k"), lit(3)) === 0, array(
          struct(lit("cvssv3.1").as("scoring_system"),
            pmod(col("k"), lit(10)).cast("string").as("value"),
            lit("CVSS:3.1/X").as("scoring_elements"),
            concat(lit("https://nvd.example/"), col("k")).as("url"))))
          .otherwise(expr(s"CAST(array() AS $sevType)")).as("severities"),
        when(pmod(col("k"), lit(4)) === 0, array(
          struct(concat(lit("https://ref/"), col("k")).as("url"),
            lit("advisory").as("reference_type"),
            concat(lit("R-"), col("k")).as("reference_id"))))
          .otherwise(expr(s"CAST(array() AS $refType)")).as("references"),
        when(pmod(col("k"), lit(5)) === 0, array(lit(79), lit(89)))
          .otherwise(expr("CAST(array() AS array<int>)")).as("weaknesses"),
        when(pmod(col("k"), lit(2)) === 0, array(
          struct(concat(lit("pkg:npm/a"), pmod(col("k"), lit(7)))
            .as("purl"),
            lit("vers:npm/>=1").as("affecting_vers"),
            lit("vers:npm/2").as("fixed_vers")),
          struct(concat(lit("pkg:npm/b"), pmod(col("k"), lit(5)))
            .as("purl"),
            lit("vers:npm/<1").as("affecting_vers"),
            lit("").as("fixed_vers"))))
          .otherwise(array(
            struct(concat(lit("pkg:npm/a"), pmod(col("k"), lit(7)))
              .as("purl"),
              lit("vers:npm/>=1").as("affecting_vers"),
              lit("vers:npm/2").as("fixed_vers")))).as("affected"))
  }

  private val unfurledSql =
    """u AS (SELECT 'exp/' || CAST(l_orderkey % 300 AS VARCHAR) AS avid,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       CAST(l_linenumber AS VARCHAR) AS version,
      |       l_quantity > 25 AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem)""".stripMargin

  private def unfurled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("exp/"), pmod(col("l_orderkey"), lit(300))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  override val entries: Seq[QueryEntry] = Seq(

    // S7 — full advisory document export: sharded path layout plus the
    // per-document collection cardinalities of serialize_advisory
    // (export.py:137-170)
    q("e1_export_rows",
      """WITH o AS (SELECT DISTINCT o_orderkey % 300 AS k FROM orders)
        |SELECT substr(sha256('exp/' || CAST(k AS VARCHAR)), 1, 2) AS shard,
        |       substr(sha256('exp/' || CAST(k AS VARCHAR)), 1, 2) || '/' ||
        |         'exp_' || CAST(k AS VARCHAR) || '.yml' AS path,
        |       'E-' || CAST(k AS VARCHAR) AS advisory_id,
        |       CASE WHEN k % 2 = 0 THEN 2 ELSE 1 END AS n_impacts,
        |       CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS n_severities,
        |       CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END AS n_references,
        |       CASE WHEN k % 5 = 0 THEN 2 ELSE 0 END AS n_weaknesses
        |FROM o ORDER BY path""") { (s, dir) =>
      FederatedExport.serialize(advisories(s, dir))
        .select("shard", "path", "advisory_id", "n_impacts",
          "n_severities", "n_references", "n_weaknesses")
        .orderBy("path")
    },

    // S7 — per-package advisory index (export.py:79-96): sorted avid
    // lists per concrete package, sharded like the documents
    q("e2_package_index",
      s"""WITH $unfurledSql,
         |agg AS (
         |  SELECT base_purl, version,
         |         string_agg(DISTINCT CASE WHEN is_affected THEN avid END,
         |                    ',' ORDER BY CASE WHEN is_affected THEN avid END)
         |           AS affected_csv,
         |         string_agg(DISTINCT CASE WHEN is_fixed THEN avid END,
         |                    ',' ORDER BY CASE WHEN is_fixed THEN avid END)
         |           AS fixing_csv
         |  FROM u GROUP BY base_purl, version)
         |SELECT base_purl || '@' || version AS purl,
         |       substr(sha256(base_purl || '@' || version), 1, 2) AS shard,
         |       coalesce(affected_csv, '') AS affected_csv,
         |       coalesce(fixing_csv, '') AS fixing_csv
         |FROM agg ORDER BY purl""") { (s, dir) =>
      FederatedExport.packageIndex(unfurled(s, dir))
        .select("purl", "shard", "affected_csv", "fixing_csv")
        .orderBy("purl")
    },
  )
}
