package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.AdvisoryJsonIngest
import graft.operators.SparkTestSession

/** The switch-over surface: one call produces every mart, queryable with
  * plain spark.sql over the graft_* views. */
class EngineSpec extends AnyFunSuite with SparkTestSession {

  test("runAdvisoryPipeline registers queryable marts") {
    val sp = spark
    import sp.implicits._
    graft.functions.GraftFunctions.register(sp)
    val raw = Seq("pypa", "ghsa", "debian").map(src =>
      AdvisoryJsonIngest.readTree(sp,
        s"src/test/resources/fixtures/advisories/$src", src).toDF())
      .reduce(_ unionByName _)
    val versionsDim = Seq(
      ("pkg:pypi/foo", "1.0.0"), ("pkg:pypi/foo", "1.20.1"),
      ("pkg:pypi/bar", "1.0"), ("pkg:pypi/bar", "2.0"))
      .toDF("base_purl", "version")
    val marts = Engine.runAdvisoryPipeline(sp, raw, versionsDim)
    assert(marts.advisories.count() == 5)
    // SQL surface over the views, with the registered engine functions
    val vulnerable = sp.sql(
      """SELECT u.base_purl, u.version, r.risk_score
        |FROM graft_unfurled u
        |JOIN graft_advisory_risk r USING (avid)
        |WHERE u.is_affected ORDER BY u.base_purl, u.version""".stripMargin)
      .collect()
    assert(vulnerable.nonEmpty)
    val inRange = sp.sql(
      "SELECT version_in_range('1.5', 'vers:pypi/>=1.0|<2.0') AS m")
      .collect().head.getBoolean(0)
    assert(inRange)
    assert(sp.sql("SELECT count(*) FROM graft_advisory_sets")
      .collect().head.getLong(0) == 5)
    // round-3 marts are registered and queryable
    val mit = sp.sql(
      """SELECT avid, base_purl, upgrade_to_versions
        |FROM graft_mitigations ORDER BY avid, base_purl""".stripMargin)
      .collect()
    assert(mit.nonEmpty)
    assert(sp.sql(
      "SELECT * FROM graft_package_counts WHERE vulnerable_package_count > 0")
      .collect().nonEmpty)
    Seq("graft_mitigation_curation", "graft_cvss31_severities",
      "graft_commit_patches").foreach { v =>
      assert(sp.sql(s"SELECT count(*) FROM $v").collect().nonEmpty, v)
    }
  }
}
