package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

class ServingExtraSpec extends AnyFunSuite with SparkTestSession {

  private def advisories = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("a/1", true, Seq(("cpe:2.3:a:nginx", "other"), ("ADV-1", "advisory"))),
      ("a/2", true, Seq(("DSA-1", "advisory"))),
      ("a/3", false, Seq(("cpe:2.3:a:nginx", "other"))))
      .toDF("avid", "is_latest", "refs")
      .withColumn("references", expr(
        "transform(refs, r -> struct(r._1 AS reference_id, r._2 AS reference_type, '' AS url))"))
  }

  test("byReferenceId: CPE lookup honors is_latest (J14)") {
    val got = Serving.byReferenceId(advisories, Seq("cpe:2.3:a:nginx"))
      .select("avid").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a/1"))
  }

  test("searchPackages purl prefix (P3)") {
    val sp = spark
    import sp.implicits._
    val pkgs = Seq("pkg:npm/lodash", "pkg:npm/express", "pkg:pypi/django")
      .toDF("base_purl")
    val got = Serving.searchPackages(pkgs, "PKG:NPM/")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("pkg:npm/lodash", "pkg:npm/express"))
  }

  test("latest-affecting/fixed-by/both queryset variants (S9)") {
    val sp = spark
    import sp.implicits._
    val advs = Seq(
      ("src/A", "ds1", true), ("src/B", "ds1", true), ("src/C", "ds2", true),
      ("src/A-old", "ds1", false))
      .toDF("avid", "datasource_id", "is_latest")
    // unfurled rows only exist for latest advisories (impacts() filters
    // is_latest), mirroring the reference's is_latest + unfurled-at guard
    val unfurled = Seq(
      ("src/A", "pkg:npm/x", "1.0", true, false),
      ("src/A", "pkg:npm/x", "2.0", false, true),
      ("src/B", "pkg:npm/x", "2.0", true, false),
      ("src/C", "pkg:npm/y", "1.0", true, false))
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val req = Seq(("pkg:npm/x", "2.0")).toDF("base_purl", "version")

    def avids(mode: String) =
      Serving.advisoriesForPurls(advs, unfurled, req, mode)
        .select("avid").collect().map(_.getString(0)).toSet
    // x@2.0: B affects it, A fixes by it, C unrelated
    assert(avids("affecting") == Set("src/B"))
    assert(avids("fixed") == Set("src/A"))
    assert(avids("both") == Set("src/A", "src/B"))

    val pairs = Serving.advisoryPurlPairs(unfurled, req, "both")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("pkg:npm/x@2.0", "src/A"), ("pkg:npm/x@2.0", "src/B")))

    val kept = Serving.todoExcluded(advs,
      Seq("ds2").toDF("datasource_id"))
      .select("avid").collect().map(_.getString(0)).toSet
    assert(kept == Set("src/A", "src/B", "src/A-old"))
  }

  test("keyed pagination is stable and O(page) (W6)") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 25).map(i => f"id$i%03d").toDF("id")
    val p1 = Serving.pageAfter(df, "id", None, 10)
      .collect().map(_.getString(0))
    val p2 = Serving.pageAfter(df, "id", Some(p1.last), 10)
      .collect().map(_.getString(0))
    assert(p1.length == 10 && p2.length == 10)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert(p2.head > p1.last)
  }
}
