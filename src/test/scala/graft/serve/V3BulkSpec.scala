package graft.serve

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Pins the two round-11 fidelity fixes in [[Serving.v3BulkPackages]]
  * (api_v3.py:253-339/:566-700/:891-959, models.py:1039-1067):
  *
  *  1. `latest_non_vulnerable_version` is ranked by ECOSYSTEM version
  *     order (`get_non_vulnerable_versions` → `sorted_versions[-1]`),
  *     not lexicographic max — "1.10" beats "1.9".
  *  2. The fixing-primary tiebreak uses the full avid string, so ids
  *     with no trailing digits (ghsa/GHSA-xxxx-yyyy) are never dropped
  *     by a NULL ordinal.
  */
class V3BulkSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: Seq[(String, String, String, Boolean, Boolean)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
  }

  private def respFor(result: org.apache.spark.sql.DataFrame, purl: String) =
    result.filter(org.apache.spark.sql.functions.col("purl") === purl)
      .select("response").collect().head.getString(0)

  test("latest_non_vulnerable uses version order, not lexicographic") {
    val sp = spark
    import sp.implicits._
    val unfurled = df(Seq(
      ("adv/1", "pkg:npm/a", "1.2", true, false),
      ("adv/1", "pkg:npm/a", "1.9", false, true),   // non-vuln, lex max
      ("adv/1", "pkg:npm/a", "1.10", false, false))) // non-vuln, version max
    val sev = Seq(("adv/1", 5)).toDF("avid", "severity")
    val req = Seq(("pkg:npm/a", "1.2")).toDF("base_purl", "version")
    val resp = respFor(Serving.v3BulkPackages(unfurled, sev, req),
      "pkg:npm/a@1.2")
    assert(resp.contains("\"latest_non_vulnerable_version\":\"1.10\""),
      s"expected 1.10 (version order), got: $resp")
  }

  test("fixing primary tiebreak keeps avids without trailing digits") {
    val sp = spark
    import sp.implicits._
    // Two fixing advisories, equal severity; only the GHSA-style id has
    // no trailing-digit suffix. Full-string tiebreak: 'ghsa/…' > 'adv/9'.
    val unfurled = df(Seq(
      ("adv/9", "pkg:npm/b", "2.0", false, true),
      ("ghsa/GHSA-aaaa-zzzz", "pkg:npm/b", "2.0", false, true)))
    val sev = Seq(("adv/9", 7), ("ghsa/GHSA-aaaa-zzzz", 7))
      .toDF("avid", "severity")
    val req = Seq(("pkg:npm/b", "2.0")).toDF("base_purl", "version")
    val resp = respFor(Serving.v3BulkPackages(unfurled, sev, req),
      "pkg:npm/b@2.0")
    assert(resp.contains("\"primary\":\"ghsa/GHSA-aaaa-zzzz\""),
      s"expected the GHSA id to win the full-string tiebreak, got: $resp")
    assert(resp.contains("\"size\":2"))
  }
}
