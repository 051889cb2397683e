package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.serve.Serving

/** SURVEY §2 S9 — the latest-affecting/fixed-by queryset variants
  * (models.py:2946-3067) exercised through the REAL serving functions
  * over a synthetic unfurled-links table derived from lineitem, with the
  * oracle re-deriving the same semi-join semantics in SQL. The request
  * list is bounded and broadcast inside Serving (the scale contract the
  * plan spec in AdvisoryPipelineSpec pins).
  */
object ServingQueries extends QueryModule {

  private def unfurled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("adv/"), pmod(col("l_orderkey"), lit(50))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  private val unfurledSql =
    """SELECT 'adv/' || CAST(l_orderkey % 50 AS VARCHAR) AS avid,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       CAST(l_linenumber AS VARCHAR) AS version,
      |       l_quantity > 25 AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem""".stripMargin

  private val Request = Seq(
    ("pkg:npm/p1", "1"), ("pkg:npm/p2", "3"), ("pkg:npm/p5", "2"))

  private val requestSql =
    "(VALUES ('pkg:npm/p1','1'),('pkg:npm/p2','3'),('pkg:npm/p5','2'))" +
      " AS req(base_purl, version)"

  private def request(s: SparkSession): DataFrame = {
    import s.implicits._
    Request.toDF("base_purl", "version")
  }

  override val entries: Seq[QueryEntry] = Seq(
    // latest_affecting_advisories_for_purls (models.py:2955-2964)
    q("s9_affecting_bulk",
      s"""WITH u AS ($unfurledSql)
         |SELECT DISTINCT u.avid
         |FROM u JOIN $requestSql
         |  ON u.base_purl = req.base_purl AND u.version = req.version
         |WHERE u.is_affected
         |ORDER BY avid""".stripMargin) { (s, dir) =>
      val u = unfurled(s, dir)
      val advisories = u.select("avid").distinct()
        .withColumn("is_latest", lit(true))
      Serving.advisoriesForPurls(advisories, u, request(s), "affecting")
        .select("avid").orderBy("avid")
    },

    // latest_advisory_purls_pairs, both edges (models.py:2966-2978,
    // 3003-3015)
    q("s9_purl_pairs",
      s"""WITH u AS ($unfurledSql)
         |SELECT DISTINCT u.base_purl || '@' || u.version AS purl, u.avid
         |FROM u JOIN $requestSql
         |  ON u.base_purl = req.base_purl AND u.version = req.version
         |WHERE u.is_affected OR u.is_fixed
         |ORDER BY purl, avid""".stripMargin) { (s, dir) =>
      Serving.advisoryPurlPairs(unfurled(s, dir), request(s), "both")
        .orderBy("purl", "avid")
    },
  )
}
