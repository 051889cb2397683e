package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

class GithubIngestSpec extends AnyFunSuite with SparkTestSession {
  private val page =
    """{"data": {"securityAdvisories": {"nodes": [
      |  {"ghsaId": "GHSA-aaaa-bbbb-cccc", "summary": "Widget RCE",
      |   "publishedAt": "2024-01-01T00:00:00Z",
      |   "updatedAt": "2024-01-05T00:00:00Z",
      |   "permalink": "https://github.com/advisories/GHSA-aaaa-bbbb-cccc",
      |   "identifiers": [{"type": "GHSA", "value": "GHSA-aaaa-bbbb-cccc"},
      |                   {"type": "CVE", "value": "CVE-2024-7777"}],
      |   "cvss": {"score": 8.1,
      |            "vectorString": "CVSS:3.1/AV:N/AC:H/PR:N/UI:N/S:U/C:H/I:H/A:H"},
      |   "references": [{"url": "https://example.org/fix"}],
      |   "vulnerabilities": {"nodes": [
      |     {"package": {"ecosystem": "PIP", "name": "widget"},
      |      "vulnerableVersionRange": ">= 1.0, < 2.0",
      |      "firstPatchedVersion": {"identifier": "2.0"}}]}}]}}}"""
      .stripMargin.replaceAll("\n", "")

  test("GraphQL page parses to AdvisoryRow (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = GithubIngest.parse(sp,
      Seq(("github", page)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "GHSA-aaaa-bbbb-cccc")
    assert(a.aliases == Seq("CVE-2024-7777")) // ghsaId excluded from aliases
    assert(a.severities.head.value == "8.1")
    val ap = a.affected.head
    assert(ap.purl == "pkg:pypi/widget")
    assert(ap.affecting_vers == "vers:pypi/>=1.0|<2.0")
    assert(ap.fixed_vers == "vers:pypi/=2.0")
  }
}

class DebianTrackerIngestSpec extends AnyFunSuite with SparkTestSession {
  private val feed =
    """{"curl": {
      |  "CVE-2024-1111": {"description": "curl overflow", "scope": "local",
      |    "releases": {"bookworm": {"status": "resolved",
      |                              "fixed_version": "7.88.1-1",
      |                              "urgency": "medium"},
      |                 "sid": {"status": "open", "fixed_version": "0",
      |                         "urgency": "low"}}}}}"""
      .stripMargin.replaceAll("\n", "")

  test("tracker map explodes to per-(package, CVE) rows (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = DebianTrackerIngest.parse(sp,
      Seq(("debian", feed)).toDF("datasource_id", "json"),
      collectedAt = "2024-06-01").collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2024-1111/curl")
    assert(a.aliases == Seq("CVE-2024-1111"))
    assert(a.severities.map(_.value).sorted.toSeq == Seq("low", "medium"))
    val fixed = a.affected.find(_.fixed_vers == "vers:deb/=7.88.1-1")
    assert(fixed.isDefined)
    assert(fixed.get.affecting_vers == "vers:deb/<7.88.1-1")
    assert(a.affected.exists(_.affecting_vers == "vers:deb/*")) // sid open
  }
}
