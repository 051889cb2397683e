package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PurlCodecSpec extends AnyFunSuite {
  test("parse full purl") {
    val p = PurlCodec.parse("pkg:maven/org.apache/commons-io@2.7?classifier=sources#src/main")
    assert(p.ptype == "maven")
    assert(p.namespace == "org.apache")
    assert(p.name == "commons-io")
    assert(p.version == "2.7")
    assert(p.qualifiers == Map("classifier" -> "sources"))
    assert(p.subpath == "src/main")
  }

  test("format round-trip is canonical") {
    assert(PurlCodec.normalize("pkg:PyPI/Django_Rest@3.1") == "pkg:pypi/django-rest@3.1")
    // namespace "@" re-encodes: str(PackageURL) percent-encodes, pinned
    // by the captured sort golden (package_sort/sorted_purls.txt
    // "pkg:npm/%40budibase/bbui@…")
    assert(PurlCodec.normalize("pkg:npm/%40angular/core@12.0.0")
      == "pkg:npm/%40angular/core@12.0.0")
    assert(PurlCodec.normalize(
      "pkg:deb/debian/jackson-databind@2.12.1-1%2Bdeb11u1?distro=sid")
      == "pkg:deb/debian/jackson-databind@2.12.1-1%2Bdeb11u1?distro=sid")
    assert(PurlCodec.normalize("pkg:deb/debian/curl@7.50.3-1") == "pkg:deb/debian/curl@7.50.3-1")
  }

  test("plain purl strips qualifiers and subpath (utils.py:410-422)") {
    val p = PurlCodec.parse("pkg:maven/g/a@1.0?type=jar#sub")
    assert(p.plain.format == "pkg:maven/g/a@1.0")
  }

  test("withVersion (utils.py:157-173)") {
    assert(PurlCodec.parse("pkg:npm/lodash@4.0.0").withVersion("4.17.21").format
      == "pkg:npm/lodash@4.17.21")
  }

  test("version scheme per type") {
    assert(PurlCodec.parse("pkg:npm/x@1").versionScheme == "semver")
    assert(PurlCodec.parse("pkg:pypi/x@1").versionScheme == "pypi")
    assert(PurlCodec.parse("pkg:deb/d/x@1").versionScheme == "deb")
    assert(PurlCodec.parse("pkg:generic/x@1").versionScheme == "generic")
  }

  test("malformed purls throw") {
    intercept[IllegalArgumentException](PurlCodec.parse("not-a-purl"))
    intercept[IllegalArgumentException](PurlCodec.parse("pkg:onlytype"))
  }
}

class CanonicalJsonSpec extends AnyFunSuite {
  test("keys sorted, compact separators") {
    assert(CanonicalJson.canonical(Map("b" -> 1, "a" -> 2)) == """{"a":2,"b":1}""")
  }
  test("lists sorted, falsy dropped (utils.py:623-691 normalize_list)") {
    assert(CanonicalJson.canonical(Seq("b", "a", "", null)) == """["a","b"]""")
  }
  test("strings trimmed") {
    assert(CanonicalJson.canonical("  x  ") == "\"x\"")
  }
  test("stable content id") {
    val a = Map("summary" -> "Issue", "aliases" -> Seq("CVE-2024-1", "GHSA-x"))
    val b = Map("aliases" -> Seq("GHSA-x", "CVE-2024-1"), "summary" -> "Issue")
    assert(CanonicalJson.contentId(a) == CanonicalJson.contentId(b))
    assert(CanonicalJson.contentId(a).length == 64)
    assert(CanonicalJson.contentId(a) != CanonicalJson.contentId(Map("summary" -> "Other")))
  }
}

class CvssSpec extends AnyFunSuite {
  private def v3(vec: String): Double = Cvss.v3BaseScore(vec).get

  test("CVSS v3.1 known scores (FIRST spec examples)") {
    // Log4Shell
    assert(v3("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:C/C:H/I:H/A:H") == 10.0)
    // Heartbleed-style partial
    assert(v3("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:N/A:N") == 7.5)
    assert(v3("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H") == 9.8)
    assert(v3("CVSS:3.1/AV:L/AC:L/PR:L/UI:N/S:U/C:H/I:H/A:H") == 7.8)
    assert(v3("CVSS:3.1/AV:N/AC:H/PR:N/UI:R/S:U/C:L/I:N/A:N") == 3.1)
    assert(v3("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:N/A:N") == 0.0)
  }

  test("severity range string matches the reference doctests") {
    // utils.py:512-523 doctest vectors, verbatim
    assert(Cvss.severityRange(Set("LOW", "7.5", "5"))
      .contains("0.1 - 7.5"))
    assert(Cvss.severityRange(Set("LOW", "Medium")).contains("0.1 - 6.9"))
    assert(Cvss.severityRange(Set("9.5", "critical"))
      .contains("9.0 - 10.0"))
    assert(Cvss.severityRange(Set("9.5", "critical", "unknown"))
      .contains("9.0 - 10.0"))
    assert(Cvss.severityRange(Set.empty[String]).isEmpty)
    assert(Cvss.severityRange(Set("unknown")).isEmpty)
    // the low bucket's upper bound is the INT 3 in the reference
    // score_map — an all-low max renders "3", not "3.0"; a parsed
    // numeric 3.0 keeps the float spelling
    assert(Cvss.severityRange(Set("LOW")).contains("0.1 - 3"))
    assert(Cvss.severityRange(Set("LOW", "3.0")).contains("0.1 - 3.0"))
    // numeric grammar follows Python float(): negatives and exponents
    assert(Cvss.severityRange(Set("-2", "1e1")).contains("-2.0 - 10.0"))
  }

  test("CVSS v2 known scores") {
    assert(Cvss.v2BaseScore("AV:N/AC:L/Au:N/C:C/I:C/A:C").get == 10.0)
    assert(Cvss.v2BaseScore("AV:N/AC:L/Au:N/C:P/I:P/A:P").get == 7.5)
    assert(Cvss.v2BaseScore("AV:N/AC:M/Au:N/C:P/I:N/A:N").get == 4.3)
    assert(Cvss.v2BaseScore("AV:L/AC:L/Au:N/C:N/I:N/A:N").get == 0.0)
  }

  test("version sniffing + malformed") {
    assert(Cvss.baseScore("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H").contains(9.8))
    assert(Cvss.baseScore("AV:N/AC:L/Au:N/C:P/I:P/A:P").contains(7.5))
    assert(Cvss.baseScore("garbage").isEmpty)
    assert(Cvss.v3BaseScore("CVSS:3.1/AV:X/AC:L").isEmpty)
  }

  test("ratings") {
    assert(Cvss.rating(0.0) == "none")
    assert(Cvss.rating(3.9) == "low")
    assert(Cvss.rating(4.0) == "medium")
    assert(Cvss.rating(7.0) == "high")
    assert(Cvss.rating(9.0) == "critical")
  }

  test("CVSS v4.0 published scores (reference fixtures + spec example)") {
    // severity_systems.py:99 docstring example
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H/SA:N")
      .contains(9.9))
    // suse-cvss-scores-expected.json
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N")
      .contains(9.3))
    // ubuntu_osv_advisoryv2-expected.json
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:A/AC:L/AT:P/PR:L/UI:P/VC:H/VI:N/VA:N/SC:N/SI:N/SA:N")
      .contains(4.1))
    // github_osv_expected_8.json
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:H/AT:P/PR:L/UI:N/VC:L/VI:L/VA:N/SC:N/SI:N/SA:N")
      .contains(2.3))
  }

  test("CVSS v4.0 total over the full base-vector grid") {
    // Every fully-specified base vector must score in [0,10]: this walks
    // all 104,976 combinations, so a missing macrovector key, an
    // unreachable max-composed candidate, or a depth-table hole would
    // surface as a None or an exception on some cell.
    var n = 0
    for {
      av <- Seq("N", "A", "L", "P"); ac <- Seq("L", "H")
      at <- Seq("N", "P"); pr <- Seq("N", "L", "H"); ui <- Seq("N", "P", "A")
      vc <- Seq("H", "L", "N"); vi <- Seq("H", "L", "N")
      va <- Seq("H", "L", "N"); sc <- Seq("H", "L", "N")
      si <- Seq("H", "L", "N"); sa <- Seq("H", "L", "N")
    } {
      val vec = s"CVSS:4.0/AV:$av/AC:$ac/AT:$at/PR:$pr/UI:$ui/" +
        s"VC:$vc/VI:$vi/VA:$va/SC:$sc/SI:$si/SA:$sa"
      val s = Cvss4.baseScore(vec)
      assert(s.isDefined, s"no score for $vec")
      assert(s.get >= 0.0 && s.get <= 10.0, s"out of range for $vec: $s")
      n += 1
    }
    assert(n == 104976)
  }

  test("CVSS v4.0 structural rules") {
    // no impact anywhere -> 0.0 (spec §8.2)
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:N/VI:N/VA:N/SC:N/SI:N/SA:N")
      .contains(0.0))
    // X-padded long-form vector parses (E:X defaults to Attacked)
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:P/PR:H/UI:P/VC:N/VI:N/VA:N/SC:H/SI:H/SA:H/" +
        "E:X/CR:X/IR:X/AR:X/MAV:X/MAC:X/MAT:X/MPR:X/MUI:X/MVC:X/MVI:X/" +
        "MVA:X/MSC:X/MSI:X/MSA:X/S:X/AU:X/R:X/V:X/RE:X/U:X").isDefined)
    // monotonicity: degrading a single metric never raises the score
    def s(vc: String, av: String) = Cvss4.baseScore(
      s"CVSS:4.0/AV:$av/AC:L/AT:N/PR:N/UI:N/VC:$vc/VI:L/VA:N/SC:N/SI:N/SA:N").get
    assert(s("H", "N") >= s("L", "N"))
    assert(s("L", "N") >= s("N", "N"))
    assert(s("H", "N") >= s("H", "P"))
    // worst and best macrovectors hit the table anchors
    assert(Cvss4.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:S/SA:S")
      .contains(10.0))
    // malformed vectors refuse rather than misscore
    assert(Cvss4.baseScore("CVSS:4.0/AV:N/AC:L").isEmpty)
    assert(Cvss4.baseScore("CVSS:4.0/garbage").isEmpty)
    // dispatch through the version sniffer
    assert(Cvss.baseScore(
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N")
      .contains(9.3))
  }
}

class RiskSpec extends AnyFunSuite {
  test("parse numeric and textual severities (risk.py:30-38)") {
    assert(Risk.parseScore("7.5").contains(7.5))
    assert(Risk.parseScore("CRITICAL").contains(10.0))
    assert(Risk.parseScore("urgent").contains(10.0))
    assert(Risk.parseScore("moderate").contains(6.9))
    assert(Risk.parseScore("HIGH").contains(8.9))
    assert(Risk.parseScore("").isEmpty) // empty skipped (risk.py:49-50)
    // unknown non-empty textual scores 0 (risk.py:56 score_map.get(v, 0))
    assert(Risk.parseScore("unknown-text").contains(0.0))
  }

  test("url domain extraction (risk.py:42-46)") {
    assert(Risk.urlDomain("https://www.nvd.nist.gov/vuln/detail/x") == "nvd.nist.gov")
    assert(Risk.urlDomain("http://github.com/a/b") == "github.com")
    assert(Risk.urlDomain("") == "")
  }

  test("weighted severity max(score*w/10) round1 (risk.py:21-61)") {
    val sevs = Seq(("7.5", "https://nvd.example"), ("critical", "https://other.example"))
    // neither domain in weight_config → default weight 5:
    // max(7.5*0.5, 10*0.5) = 5.0
    assert(Risk.weightedSeverity(sevs) == 5.0)
    val weighted = Risk.weightedSeverity(sevs, Map("nvd.example" -> 10))
    assert(weighted == 7.5) // 7.5*1.0 beats 10*0.5
    // the empty max is 0, not absent (risk.py:60)
    assert(Risk.weightedSeverity(Nil) == 0.0)
    // a severity with no URL is skipped outright (risk.py:42-43)
    assert(Risk.weightedSeverity(Seq(("9.8", ""))) == 0.0)
    // the bundled weight_config drives the default lookup (risk.py:46)
    assert(Risk.weightedSeverity(
      Seq(("10", "https://nvd.nist.gov/vuln/x"))) == 9.0)
  }

  test("bundled weight_config table (weight_config.py:10-2912)") {
    assert(SeverityWeights.map.size > 2800)
    assert(SeverityWeights.map("nvd.nist.gov") == 9)
    assert(SeverityWeights.map("rustsec.org") == 8)
    assert(SeverityWeights.map("issues.apache.org") == 7)
    assert(SeverityWeights.map("advisory.checkmarx.net") == 6)
    assert(SeverityWeights.map.values.forall(w => w >= 0 && w <= 10))
  }

  test("exploitability cascade (risk.py:64-92)") {
    assert(Risk.exploitability(hasExploit = true, Nil, hasExploitReference = false) == 2.0)
    assert(Risk.exploitability(hasExploit = false, Seq(0.9), hasExploitReference = false) == 2.0)
    assert(Risk.exploitability(hasExploit = false, Seq(0.5), hasExploitReference = true) == 1.0)
    assert(Risk.exploitability(hasExploit = false, Nil, hasExploitReference = false) == 0.5)
  }

  test("risk = min(ws*e, 10) HALF_UP 1 decimal (models.py:305-315)") {
    assert(Risk.riskScore(7.5, 2.0).contains(10.0)) // capped
    assert(Risk.riskScore(3.2, 2.0).contains(6.4))
    assert(Risk.riskScore(3.25, 1.0).contains(3.3)) // HALF_UP
    // unset unless both factors truthy (pipes/risk_score.py:114-116)
    assert(Risk.riskScore(0.0, 2.0).isEmpty)
  }

  test("urlDomain lowercases before stripping www. (weight-table hit)") {
    assert(Risk.urlDomain("https://WWW.Example.com/advisory") == "example.com")
    assert(Risk.urlDomain("https://www.example.com/x") == "example.com")
    assert(Risk.urlDomain("http://Example.COM/a?b#c") == "example.com")
  }

  test("purl percent-escapes decode as UTF-8 bytes, not per-byte chars") {
    // %C3%A9 is one two-byte UTF-8 character
    val p = PurlCodec.parse("pkg:pypi/caf%C3%A9@1.0")
    assert(p.name == "caf\u00e9")
    // ASCII escapes unchanged; bad escapes pass through literally
    assert(PurlCodec.parse("pkg:generic/a%2Fb@1").name == "a/b")
  }
}
