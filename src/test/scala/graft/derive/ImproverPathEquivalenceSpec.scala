package graft.derive

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Vers, VersionOrd}
import graft.operators.SparkTestSession

/** Path equivalence for the round-14 d17 split: validVersionInferences
  * now routes PURE interval specs (one optional `>=`, one optional
  * `<`/`<=`, or a single `=`) through a bound-filter + min-aggregation
  * fast path and everything else through the original nearest-fix
  * window. The d17/d17b oracles only exercise pure specs, so this spec
  * pins BOTH paths against a brute-force reference evaluator built on
  * the same primitives the reference trusts (Vers.versionInRange +
  * nearest-strictly-greater-unaffected, utils.py
  * nearest_patched_package): exclusions, inverted bounds, `>` ops,
  * unbounded sides, `=` pins, and no-match ranges all included.
  * The semver fixture's keys are distinct; the apache fixture then
  * deliberately sort-TIES distinct version strings (build metadata:
  * 0.10.2.2 ties 0.10.2) to pin the window path's tie discipline —
  * a tied unaffected version is never the fix (bisect_right skips
  * equal precedence, utils.py:190) and tie picks are deterministic. */
class ImproverPathEquivalenceSpec extends AnyFunSuite with SparkTestSession {

  private val scheme = "semver"
  private val versions = Seq(
    "1.0.0", "1.5.0", "2.0.0", "2.5.0", "3.0.0", "3.0.1", "4.0.0",
    "5.0.0-alpha", "5.0.0", "6.1.2")

  private val specs = Seq(
    // pure shapes (fast path)
    "p1" -> "vers:semver/>=2.0.0|<=4.0.0",
    "p2" -> "vers:semver/>=2.0.0|<4.0.0",
    "p3" -> "vers:semver/>=5.0.0",
    "p4" -> "vers:semver/<2.0.0",
    "p5" -> "vers:semver/=3.0.1",
    "p6" -> "vers:semver/>=9.0.0",            // matches nothing
    // general shapes (window path)
    "g1" -> "vers:semver/>=2.0.0|<=4.0.0|!=3.0.0",
    "g2" -> "vers:semver/>2.0.0|<4.0.0",      // '>' is not pure
    "g3" -> "vers:semver/>=4.0.0|<2.0.0",     // inverted: disjunction
    "g4" -> "vers:semver/<1.5.0|>=5.0.0",     // multi-interval
    "g5" -> "vers:semver/=1.0.0|=6.1.2")      // multi-pin

  test("pure fast path and general window path both match brute force") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._

    val impacts = specs.map { case (id, spec) =>
      (s"adv/$id", "npm", "", "pkg", "", spec, null: String)
    }.toDF("avid", "ptype", "namespace", "name", "qualifiers",
      "affecting_vers", "fixed_version")
    val dim = versions.map(v => ("npm", "", "pkg", v))
      .toDF("ptype", "namespace", "name", "version")

    val got = Improvers.validVersionInferences(impacts, dim)
      .select(col("avid"), concat_ws(",", col("affected_versions")),
        coalesce(col("fixed_version"), lit("-")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

    val key = (v: String) => VersionOrd.sortKey(scheme, v)
    val expected = specs.flatMap { case (id, spec) =>
      val in = (v: String) => Vers.versionInRange(v, spec)
      val affected = versions.filter(in)
      affected.groupBy { v =>
        versions.filter(u => !in(u) && key(u) > key(v))
          .sortBy(u => (key(u), u)).headOption.getOrElse("-")
      }.map { case (fix, avs) =>
        (s"adv/$id", avs.sortBy(key).mkString(","), fix)
      }
    }.toSet

    assert(got == expected,
      s"\n  only engine: ${got -- expected}\n  only brute: ${expected -- got}")
  }

  test("apache key-tied corpus: both paths match brute force") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._

    val apacheVersions = Seq("2.4.1", "2.4.2", "2.4.2.2", "2.4.3",
      "2.4.3.1", "2.4.4", "10.0.0-M4", "10.0.0", "10.0.0.1", "10.1")
    val apacheSpecs = Seq(
      // pure shapes (fast path) across tie boundaries
      "pa1" -> "vers:apache/<=2.4.2",          // inclusive hi catches the tie
      "pa2" -> "vers:apache/>=2.4.2|<2.4.4",
      "pa3" -> "vers:apache/>=2.4.3|<10.0.0",  // fix lands on a tied pair
      "pa4" -> "vers:apache/>=10.0.0|<10.1",
      // general shapes (window path): exclusion and pin hit eqKey, '>'
      // fails on a precedence tie
      "ga1" -> "vers:apache/>=2.4.1|<2.4.4|!=2.4.2.2",
      "ga2" -> "vers:apache/=2.4.2",
      "ga3" -> "vers:apache/>2.4.2|<10.0.0")

    val impacts = apacheSpecs.map { case (id, spec) =>
      (s"adv/$id", "apache", "", "httpd", "", spec, null: String)
    }.toDF("avid", "ptype", "namespace", "name", "qualifiers",
      "affecting_vers", "fixed_version")
    val dim = apacheVersions.map(v => ("apache", "", "httpd", v))
      .toDF("ptype", "namespace", "name", "version")

    val got = Improvers.validVersionInferences(impacts, dim)
      .select(col("avid"), concat_ws(",", col("affected_versions")),
        coalesce(col("fixed_version"), lit("-")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

    val key = (v: String) => VersionOrd.sortKey("apache", v)
    val expected = apacheSpecs.flatMap { case (id, spec) =>
      val in = (v: String) => Vers.versionInRange(v, spec)
      val affected = apacheVersions.filter(in)
      affected.groupBy { v =>
        // strictly-greater KEY: a precedence tie is never the fix
        apacheVersions.filter(u => !in(u) && key(u) > key(v))
          .sortBy(u => (key(u), u)).headOption.getOrElse("-")
      }.map { case (fix, avs) =>
        (s"adv/$id", avs.sortBy(v => (key(v), v)).mkString(","), fix)
      }
    }.toSet

    assert(got == expected,
      s"\n  only engine: ${got -- expected}\n  only brute: ${expected -- got}")
    // the tie boundary actually bites: <=2.4.2 includes the tied .2.2
    assert(got.exists(_._2.contains("2.4.2.2")))
  }

  test("vers_pure_bounds_native classifies and bounds correctly") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val rows = specs.map(_._2).toDF("spec")
      .select(col("spec"),
        call_function("vers_pure_bounds_native", col("spec")).as("b"))
      .select(col("spec"), col("b.pure"), col("b.lo_key"), col("b.hi_key"),
        col("b.hi_incl"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(1), Option(r.getString(2)), Option(r.getString(3)),
          r.getBoolean(4))).toMap
    val k = (v: String) => VersionOrd.sortKey("semver", v)
    assert(rows("vers:semver/>=2.0.0|<=4.0.0") ==
      ((true, Some(k("2.0.0")), Some(k("4.0.0")), true)))
    assert(rows("vers:semver/>=2.0.0|<4.0.0") ==
      ((true, Some(k("2.0.0")), Some(k("4.0.0")), false)))
    assert(rows("vers:semver/>=5.0.0") ==
      ((true, Some(k("5.0.0")), None, false)))
    assert(rows("vers:semver/<2.0.0") ==
      ((true, None, Some(k("2.0.0")), false)))
    assert(rows("vers:semver/=3.0.1") ==
      ((true, Some(k("3.0.1")), Some(k("3.0.1")), true)))
    // non-pure shapes must all fall back
    for (s <- Seq("vers:semver/>=2.0.0|<=4.0.0|!=3.0.0",
        "vers:semver/>2.0.0|<4.0.0", "vers:semver/>=4.0.0|<2.0.0",
        "vers:semver/<1.5.0|>=5.0.0", "vers:semver/=1.0.0|=6.1.2"))
      assert(!rows(s)._1, s)
    // malformed spec: not pure, never throws
    val bad = Seq("not a spec").toDF("spec")
      .select(call_function("vers_pure_bounds_native", col("spec"))
        .getField("pure")).head().getBoolean(0)
    assert(!bad)
  }
}
