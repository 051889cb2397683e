package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** vers: range membership truth tables (reference semantics:
  * utils.py:353-390 resolve_version_range + univers containment;
  * nginx table tests/pipelines/test_nginx_importer_pipeline.py:44-91). */
class VersSpec extends AnyFunSuite {

  private def in(spec: String, v: String): Unit =
    assert(Vers.versionInRange(v, spec), s"expected $v IN $spec")
  private def out(spec: String, v: String): Unit =
    assert(!Vers.versionInRange(v, spec), s"expected $v NOT IN $spec")

  test("star matches everything except exclusions") {
    in("vers:npm/*", "0.0.1")
    in("vers:npm/*", "99.99.99")
    out("vers:npm/*|!=1.5.0", "1.5.0")
    in("vers:npm/*|!=1.5.0", "1.5.1")
  }

  test("simple interval") {
    val spec = "vers:semver/>=1.2.0|<2.0.0"
    in(spec, "1.2.0")
    in(spec, "1.5.3")
    in(spec, "1.99.99")
    out(spec, "1.1.9")
    out(spec, "2.0.0")
    out(spec, "2.0.1")
  }

  test("strict bounds") {
    val spec = "vers:semver/>1.0.0|<=1.3.0"
    out(spec, "1.0.0")
    in(spec, "1.0.1")
    in(spec, "1.3.0")
    out(spec, "1.3.1")
  }

  test("multiple intervals (nginx branch style)") {
    val spec = "vers:nginx/>=1.5.10|<1.6.0|>=1.7.0|<1.7.5"
    in(spec, "1.5.10")
    in(spec, "1.5.11")
    out(spec, "1.6.0")
    out(spec, "1.6.2")
    in(spec, "1.7.0")
    in(spec, "1.7.4")
    out(spec, "1.7.5")
  }

  test("unbounded below / above") {
    in("vers:semver/<1.2.3", "0.0.1")
    in("vers:semver/<1.2.3", "1.2.2")
    out("vers:semver/<1.2.3", "1.2.3")
    in("vers:semver/>=2.0.0", "2.0.0")
    in("vers:semver/>=2.0.0", "99.0.0")
    out("vers:semver/>=2.0.0", "1.9.9")
  }

  test("pins and exclusions") {
    val spec = "vers:pypi/=1.2|=2.0"
    in(spec, "1.2")
    in(spec, "1.2.0") // pypi trailing zeros equal
    in(spec, "2.0")
    out(spec, "1.3")
    out("vers:semver/>=1.0.0|<2.0.0|!=1.5.0", "1.5.0")
    in("vers:semver/>=1.0.0|<2.0.0|!=1.5.0", "1.5.1")
  }

  test("ecosystem-aware membership") {
    in("vers:deb/>=1.0|<2.0", "1.0-1")
    in("vers:deb/<1.0", "1.0~rc1")     // tilde before release
    out("vers:pypi/<1.0", "1.0.0")
    in("vers:pypi/<1.0", "1.0rc1")
    in("vers:semver/<1.10.0", "1.9.9") // numeric compare
    out("vers:semver/<1.10.0", "1.10.0")
  }

  test("apache membership: build metadata ties order but splits =/!=") {
    // univers ApacheVersion (semantic_version): <,<=,>,>= ignore build
    // metadata, ==/!= include it — so 0.10.2.2 (== 0.10.2+2) satisfies
    // <=0.10.2 yet is not excluded by !=0.10.2 nor pinned by =0.10.2
    in("vers:apache/<=0.10.2", "0.10.2.2")     // precedence tie → <= holds
    out("vers:apache/<0.10.2", "0.10.2.2")     // strict < fails on a tie
    in("vers:apache/>=0.10.2", "0.10.2.2")
    out("vers:apache/>=0.10.2|<0.10.2.2", "0.10.2") // hi key ties lo → walk
    out("vers:apache/=0.10.2", "0.10.2.2")     // eq includes build
    in("vers:apache/=0.10.2+2", "0.10.2.2")
    in("vers:apache/>=0.10.1|<=0.10.3|!=0.10.2", "0.10.2.2") // != misses tie
    out("vers:apache/>=0.10.1|<=0.10.3|!=0.10.2.2", "0.10.2.2")
    in("vers:apache/>=0.10.1|<=0.10.3|!=0.10.2.2", "0.10.2")
    in("vers:apache/<10.0.0", "10.0.0-M4")     // milestone below release
  }

  test("key-tied lower/upper bound pair: membership is spec-order " +
      "independent (lower bound sorts first on ties)") {
    // apache build metadata sort-ties 0.10.2.2 with 0.10.2, so this
    // pair shares a sortKey. Both spellings must read as ONE interval
    // (empty at the tie), not as (-inf,hi) ∪ [lo,inf) = everything.
    for (spec <- Seq("vers:apache/>=0.10.2|<0.10.2.2",
        "vers:apache/<0.10.2.2|>=0.10.2")) {
      out(spec, "0.10.1")   // below the pair
      out(spec, "0.10.2")   // at the tie: >= holds, < fails
      out(spec, "0.10.2.2") // the tie's build twin: same keys
      out(spec, "0.10.3")   // above the pair
    }
  }

  test("exact pin extraction (V3)") {
    val (pins, excluded) = Vers.exactVersions("vers:npm/=1.0.0|>=2.0.0|<3.0.0|!=2.5.0")
    assert(pins == Seq("1.0.0"))
    assert(excluded == Seq("2.5.0"))
  }

  test("spec round-trip") {
    val r = Vers.parse("vers:semver/>=1.2.0|<2.0.0|!=1.5.0")
    assert(r.scheme == "semver")
    assert(r.spec == "vers:semver/>=1.2.0|<2.0.0|!=1.5.0")
  }
}
