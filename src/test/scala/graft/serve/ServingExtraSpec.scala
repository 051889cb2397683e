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
