package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for ecosystem version ordering — the executable spec the
  * reference keeps as univers doctests + the nginx table
  * (tests/pipelines/test_nginx_importer_pipeline.py:44-91). */
class VersionOrdSpec extends AnyFunSuite {

  private def lt(scheme: String, a: String, b: String): Unit =
    assert(VersionOrd.compare(scheme, a, b) < 0,
      s"[$scheme] expected $a < $b")
  private def eqv(scheme: String, a: String, b: String): Unit =
    assert(VersionOrd.compare(scheme, a, b) == 0,
      s"[$scheme] expected $a == $b")

  test("semver ordering") {
    lt("semver", "1.0.0", "2.0.0")
    lt("semver", "1.0.0", "1.1.0")
    lt("semver", "1.1.0", "1.1.1")
    lt("semver", "1.9.0", "1.10.0")   // numeric, not lexical
    lt("semver", "9.9.9", "10.0.0")
    lt("semver", "1.0.0-alpha", "1.0.0")
    lt("semver", "1.0.0-alpha", "1.0.0-alpha.1")
    lt("semver", "1.0.0-alpha.1", "1.0.0-alpha.beta")
    lt("semver", "1.0.0-alpha.beta", "1.0.0-beta")
    lt("semver", "1.0.0-beta", "1.0.0-beta.2")
    lt("semver", "1.0.0-beta.2", "1.0.0-beta.11")
    lt("semver", "1.0.0-beta.11", "1.0.0-rc.1")
    lt("semver", "1.0.0-rc.1", "1.0.0")
    eqv("semver", "1.2", "1.2.0")
    eqv("semver", "v1.2.3", "1.2.3")
    eqv("semver", "1.0.0+build1", "1.0.0+build2") // build ignored
  }

  test("pypi (PEP 440) ordering") {
    lt("pypi", "1.0", "1.1")
    lt("pypi", "1.9", "1.10")
    eqv("pypi", "1.0", "1.0.0")      // trailing zeros insignificant
    eqv("pypi", "1.0", "1.0.0.0")
    lt("pypi", "1.0.dev1", "1.0a1")
    lt("pypi", "1.0a1", "1.0a2")
    lt("pypi", "1.0a2", "1.0b1")
    lt("pypi", "1.0b1", "1.0rc1")
    lt("pypi", "1.0rc1", "1.0")
    lt("pypi", "1.0", "1.0.post1")
    lt("pypi", "1.0.post1", "1.1")
    lt("pypi", "1.0a1.dev1", "1.0a1")
    lt("pypi", "0.9", "1!0.1")       // epoch dominates
    eqv("pypi", "1.0RC1", "1.0rc1")  // case-insensitive
    // PEP 440 alternate spelling: bare 'c' (no separator) == rc — this
    // used to fall through the parse and key EQUAL to the final 1.0
    eqv("pypi", "1.0c1", "1.0rc1")
    lt("pypi", "1.0c1", "1.0")
    lt("pypi", "1.0b1", "1.0c1")
  }

  test("debian ordering") {
    lt("deb", "1.0", "1.1")
    lt("deb", "1.0", "1.0-1")
    lt("deb", "1.0-1", "1.0-2")
    lt("deb", "1.0~rc1", "1.0")      // tilde sorts before release
    lt("deb", "1.0~rc1", "1.0~rc2")
    lt("deb", "1.0", "1:0.5")        // epoch dominates
    lt("deb", "2.0-1", "1:1.0-1")
    lt("deb", "1.0a", "1.0+b")       // letters before symbols
    lt("deb", "1.2.3", "1.2.3a")
    lt("deb", "09", "10")            // leading zeros numeric
  }

  test("rpm ordering") {
    lt("rpm", "1.0", "1.1")
    lt("rpm", "1.0~beta", "1.0")     // tilde pre-release
    lt("rpm", "1.0", "1.0^post")     // caret post-release
    lt("rpm", "1.0^post", "1.0.1")
    lt("rpm", "1.0", "1:0.1")        // epoch
    lt("rpm", "1.05", "1.6")         // numeric segments: 5 < 6
    lt("rpm", "1.0.a", "1.0.1")      // alpha < numeric in rpm
  }

  test("maven ordering") {
    lt("maven", "1.0", "1.1")
    eqv("maven", "1.0", "1")         // trailing zeros insignificant
    eqv("maven", "1.0", "1.0.ga")
    lt("maven", "1.0-alpha-1", "1.0-beta-1")
    lt("maven", "1.0-beta-1", "1.0-rc1")
    lt("maven", "1.0-rc1", "1.0-SNAPSHOT")
    lt("maven", "1.0-SNAPSHOT", "1.0")
    lt("maven", "1.0", "1.0-sp")
    lt("maven", "1.0-sp", "1.0.1")
    lt("maven", "1.0-alpha-1", "1.0-1") // qualifier < number
  }

  test("alpine (apk) ordering — the scheme the reference patches (models.py:87)") {
    lt("alpine", "1.2.2", "1.2.3")
    lt("alpine", "1.2.3_alpha", "1.2.3_beta")
    lt("alpine", "1.2.3_beta", "1.2.3_pre1")
    lt("alpine", "1.2.3_pre1", "1.2.3_rc1")
    lt("alpine", "1.2.3_rc1", "1.2.3")
    lt("alpine", "1.2.3", "1.2.3_p1")     // patch release after
    lt("alpine", "1.2.3_p1", "1.2.3_p2")
    lt("alpine", "1.2.3", "1.2.3a")       // letter suffix is newer
    lt("alpine", "1.2.3a", "1.2.3b")
    lt("alpine", "1.2.3-r1", "1.2.3-r2")  // package revision
    lt("alpine", "1.2.3_rc1-r9", "1.2.3-r0")
    lt("alpine", "1.9.0", "1.10.0")
  }

  test("alpm (pacman vercmp) pkgrel ordering") {
    lt("alpm", "1.0-1", "1.0-2")
    // pkgrel walks digit segments like the pkgver ('1.5' is 1 then 5,
    // not the digit concatenation 15)
    lt("alpm", "1.0-1.5", "1.0-2")
    lt("alpm", "1.0-1", "1.0-1.5")
    lt("alpm", "1.0-2", "1.1-1")
    eqv("alpm", "1.0-1", "1.0-1")
    // DOCUMENTED DIVERGENCE from vercmp (which ignores pkgrel when only
    // one side has it): a missing pkgrel keys as 0, so '1.0' < '1.0-2'
    lt("alpm", "1.0", "1.0-2")
  }

  test("edge cases: deep pypi/deb/rpm forms") {
    lt("pypi", "1.0.post1", "1.0.post2")
    lt("pypi", "1.0.post1.dev2", "1.0.post1")
    lt("deb", "2:1.1~rc1-1", "2:1.1-1")
    lt("deb", "2:1.1-1", "2:1.1-1ubuntu1")
    lt("rpm", "1.0.z", "1.0.1")           // alpha segment < numeric
    lt("rpm", "1.0~rc1^post", "1.0")      // tilde dominates
  }

  test("openssl ordering (univers OpensslVersion two-era order)") {
    // legacy era: letter patches as string after the numeric triple
    lt("openssl", "1.1.1", "1.1.1a")
    lt("openssl", "1.1.1a", "1.1.1b")
    lt("openssl", "0.9.8z", "0.9.8za")      // z < za (real releases)
    lt("openssl", "0.9.8zh", "1.0.0")
    // legacy prereleases OpenSSL actually shipped: beta sorts BELOW the
    // release AND below any letter patch (release-history order; the
    // old generic fallback inverted this)
    lt("openssl", "1.0.0-beta1", "1.0.0")
    lt("openssl", "1.0.0-beta1", "1.0.0-beta2")
    lt("openssl", "1.0.0-beta5", "1.0.0")
    lt("openssl", "1.0.0-beta5", "1.0.0a")
    lt("openssl", "0.9.8", "1.0.0-beta1")   // still above older releases
    // era split: every legacy below every 3.x, prerelease grammar there
    lt("openssl", "1.1.1t", "3.0.0-alpha1")
    lt("openssl", "3.0.0-alpha1", "3.0.0")
    lt("openssl", "3.0.7", "3.1.0")
  }

  test("apache ordering (univers ApacheVersion = semantic_version coerce)") {
    lt("apache", "1.3", "2.0")
    eqv("apache", "2.37", "2.37.0")        // coerce pads to 3 segments
    lt("apache", "2.4.9", "2.4.10")
    // 4-segment build metadata: IGNORED by precedence (the boundary the
    // generic fallback got wrong — it read 0.10.2.2 > 0.10.2)
    eqv("apache", "0.10.2.2", "0.10.2")
    eqv("apache", "0.10.2.2", "0.10.2+2")
    lt("apache", "0.10.2.2", "0.10.3")
    lt("apache", "0.10.1", "0.10.2.2")
    eqv("apache", "1.2.3.4.5", "1.2.3")    // deep tails are all build
    // prerelease shapes: tomcat milestones and glued letters
    lt("apache", "10.0.0-M4", "10.0.0")
    // tomcat 9's dotted milestone spelling: coerce reads a '.'-led tail
    // as BUILD, so univers ties it with the release (not a prerelease)
    eqv("apache", "9.0.0.M4", "9.0.0")
    lt("apache", "3.3a", "3.3")            // glued letter → prerelease
    lt("apache", "10.0.0-M10", "10.0.0-M4") // alnum ids compare lexically
    // equality (eqKey) is finer than order: build participates
    assert(VersionOrd.eqKey("apache", "0.10.2.2") !=
      VersionOrd.eqKey("apache", "0.10.2"))
    assert(VersionOrd.eqKey("apache", "0.10.2.2") ==
      VersionOrd.eqKey("apache", "0.10.2+2"))
    assert(VersionOrd.eqKey("apache", "0.10.2+02") !=
      VersionOrd.eqKey("apache", "0.10.2+2")) // build tuple is verbatim
    assert(VersionOrd.eqKey("apache", "2.37") ==
      VersionOrd.eqKey("apache", "2.37.0")) // no build → eqKey == sortKey
  }

  test("generic ordering") {
    lt("generic", "1.0", "1.0.1")
    lt("generic", "1.9", "1.10")
    lt("generic", "0.9.8", "0.10.0")
    eqv("generic", "V1.0", "1.0")
    lt("generic", "2021.1", "2021.2")
  }

  test("nginx-style versions use semver ordering") {
    lt("nginx", "1.5.9", "1.5.10")
    lt("nginx", "1.5.10", "1.6.0")
    lt("nginx", "0.6.18", "1.20.0")
  }

  test("sortKey lexicographic order equals compare order") {
    val versions = Seq("0.1.0", "1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-rc.1",
      "1.0.0", "1.0.1", "1.2.0", "1.10.0", "2.0.0")
    val byKey = versions.sortBy(VersionOrd.sortKey("semver", _))
    assert(byKey == versions)
  }
}
