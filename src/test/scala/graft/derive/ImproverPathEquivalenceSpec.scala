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
  * Version keys in the fixture are DISTINCT by construction so the
  * window's tie behavior (sort-order-dependent) cannot blur the
  * compare. */
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
