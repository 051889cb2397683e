package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Boundary behavior at the SQL/UDF surface: nulls, malformed inputs and
  * empty ranges must degrade deterministically, never throw mid-job. */
class EdgeCaseSpec extends AnyFunSuite with SparkTestSession {

  test("empty and malformed vers specs") {
    assert(!Vers.versionInRange("1.0", "vers:pypi/"))      // empty constraints
    intercept[IllegalArgumentException](Vers.parse("not-a-vers"))
    intercept[IllegalArgumentException](Vers.parse("vers:noslash"))
    // bare version constraint = pin
    assert(Vers.versionInRange("1.0", "vers:pypi/1.0"))
  }

  test("UDF surface is total: nulls and garbage yield false/null, not errors") {
    val sp = spark
    import sp.implicits._
    GraftFunctions.register(sp)
    val rows = Seq(
      ("1.0", "vers:semver/>=0.5|<2.0"),
      ("1.0", "garbage-spec"),
      (null.asInstanceOf[String], "vers:semver/*"))
      .toDF("v", "spec")
    val out = rows.selectExpr(
      "version_in_range(v, spec) AS m",
      "purl_normalize('not a purl') AS p",
      "cvss_base_score('nonsense') AS c").collect()
    assert(out(0).getBoolean(0))
    assert(!out(1).getBoolean(0))          // malformed spec → false
    assert(out(0).isNullAt(1))             // malformed purl → null
    assert(out(0).isNullAt(2))             // malformed vector → null
  }

  test("native expressions handle null columns") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some("1.0.0"), Some("vers:semver/>=0.1|<2.0")),
      (None, Some("vers:semver/*")), (Some("1.0.0"), None))
      .toDF("v", "spec")
    val out = df.selectExpr("version_in_range_native(v, spec) AS m",
      "version_sort_key_native('semver', v) AS k").collect()
    assert(out(0).getBoolean(0))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null-propagating
    assert(out(2).isNullAt(0))
  }

  test("purl qualifiers sorted canonically; subpath kept") {
    val p = PurlCodec.parse(
      "pkg:maven/g/a@1.0?zeta=z&alpha=a&Empty=#src/main/java")
    assert(p.format == "pkg:maven/g/a@1.0?alpha=a&zeta=z#src/main/java")
  }

  test("sort keys are stable for pathological versions") {
    val weird = Seq("", "   ", "v", "1..2", "1.0.0-", "~", "1:2:3", "a.b.c",
      "999999999999999999999999.1", "1.0+only-build")
    for (scheme <- Seq("semver", "pypi", "deb", "rpm", "maven", "alpine",
      "generic"); v <- weird) {
      val k1 = VersionOrd.sortKey(scheme, v)
      val k2 = VersionOrd.sortKey(scheme, v)
      assert(k1 == k2, s"unstable key for [$scheme] '$v'")
      assert(VersionOrd.compare(scheme, v, v) == 0)
    }
  }
}
