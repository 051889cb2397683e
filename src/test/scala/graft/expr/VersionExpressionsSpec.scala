package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

class VersionExpressionsSpec extends AnyFunSuite with SparkTestSession {

  test("native expressions registered via extensions, codegen path") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("semver", "1.2.3"), ("semver", "1.10.0"), ("pypi", "1.0rc1"))
      .toDF("scheme", "version")
    val keys = df.selectExpr("version_sort_key_native(scheme, version) AS k",
      "version").collect().map(r => r.getString(1) -> r.getString(0)).toMap
    assert(keys("1.2.3") == graft.functions.VersionOrd.sortKey("semver", "1.2.3"))
    assert(keys("1.10.0") > keys("1.2.3"))

    val in = df.selectExpr(
      "version", "version_in_range_native(version, 'vers:semver/>=1.3.0|<2.0.0') AS m")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!in("1.2.3") && in("1.10.0"))
  }

  test("constant-range rewrite rule produces sort-key bounds with same results") {
    val sp = spark
    import sp.implicits._
    // parquet-backed so ConvertToLocalRelation doesn't evaluate the filter
    // eagerly (as it would over an in-memory LocalRelation)
    val dir = java.nio.file.Files.createTempDirectory("vers").toString
    Seq("0.9.0", "1.0.0", "1.2.0", "1.10.0", "2.0.0", "2.1.0")
      .toDF("version").write.mode("overwrite").parquet(dir)
    val versions = sp.read.parquet(dir)
    val spec = "vers:semver/>=1.0.0|<2.0.0"
    val filtered = versions
      .filter(expr(s"version_in_range_native(version, '$spec')"))
    // rule fired: the optimized plan contains the sort-key expression, not
    // the range expression
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(optimized.contains("version_sort_key_native"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("version_in_range_native"))
    // identical results to the UDF formulation
    val got = filtered.collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("1.0.0", "1.10.0", "1.2.0"))

    // non-pure specs (pins/exclusions) are NOT rewritten
    val withPin = versions.filter(
      expr("version_in_range_native(version, 'vers:semver/>=1.0.0|<2.0.0|!=1.2.0')"))
    assert(withPin.queryExecution.optimizedPlan.toString
      .contains("version_in_range_native"))
    assert(withPin.collect().map(_.getString(0)).sorted.toSeq
      == Seq("1.0.0", "1.10.0"))
  }

  test("non-constant spec column still evaluates correctly") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("1.5.0", "vers:semver/>=1.0.0|<2.0.0"),
      ("2.5.0", "vers:semver/>=1.0.0|<2.0.0"),
      ("1.5.0", "vers:semver/=1.5.0")).toDF("version", "spec")
    val got = df.selectExpr("version_in_range_native(version, spec) AS m")
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, true))
  }
}
