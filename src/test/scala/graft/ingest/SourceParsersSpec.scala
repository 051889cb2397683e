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
      |                         "urgency": "low"},
      |                 "trixie": {"status": "resolved", "fixed_version": "0",
      |                            "urgency": "unimportant"}}}}}"""
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
    assert(a.severities.map(_.value).sorted.toSeq ==
      Seq("low", "medium", "unimportant"))
    val fixed = a.affected.find(_.fixed_vers == "vers:deb/=7.88.1-1")
    assert(fixed.isDefined)
    assert(fixed.get.affecting_vers == "vers:deb/<7.88.1-1")
    assert(a.affected.exists(_.affecting_vers == "vers:deb/*")) // sid open
    // resolved + fixed_version "0" = never affected -> NO impact row
    // (mapping it to vers:deb/* would invert the tracker's semantics)
    assert(a.affected.length == 2)
  }
}

class GitlabIngestSpec extends AnyFunSuite with SparkTestSession {
  private val gemYaml =
    """---
      |identifier: "CVE-2030-7777"
      |package_slug: "gem/actionpack"
      |title: "Header injection"
      |description: "The actionpack gem is vulnerable to header injection."
      |date: "2024-02-01"
      |pubdate: "2024-01-20"
      |affected_range: ">=4.0.0 <4.2.11.2||~>5.2.0"
      |fixed_versions:
      |- "4.2.11.2"
      |- "5.2.1"
      |urls:
      |- "https://nvd.nist.gov/vuln/detail/CVE-2030-7777"
      |- "https://rails.example/fix"
      |cvss_v3: "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:H/A:N"
      |cwe_ids:
      |- "CWE-93"
      |identifiers:
      |- "CVE-2030-7777"
      |- "GHSA-qqqq-wwww"
      |""".stripMargin

  private val mavenYaml =
    """---
      |identifier: "CVE-2030-8888"
      |package_slug: "maven/com.acme/widget-core"
      |title: "Deserialization"
      |description: "Widget deserializes untrusted data."
      |pubdate: "2024-03-05"
      |affected_range: "(,9.1.6)"
      |fixed_versions:
      |- "9.1.6"
      |urls:
      |- "https://example.org/adv"
      |identifiers:
      |- "CVE-2030-8888"
      |""".stripMargin

  test("gem advisory parses: slug purl, native + pessimistic ranges (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = GitlabIngest.parse(sp,
      Seq(("gitlab", "gem/actionpack/CVE-2030-7777.yml", gemYaml))
        .toDF("datasource_id", "path", "yaml")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "gem/actionpack/CVE-2030-7777")
    assert(a.aliases == Seq("CVE-2030-7777", "GHSA-qqqq-wwww"))
    assert(a.summary.startsWith("Header injection\n"))
    assert(a.weaknesses == Seq(93))
    assert(a.severities.map(_.scoring_system) == Seq("cvssv3.1"))
    val ap = a.affected.head
    assert(ap.purl == "pkg:gem/actionpack")
    // ruby pessimistic: Gem::Requirement("~> 5.2.0") => [">= 5.2.0", "< 5.3"]
    assert(ap.affecting_vers.endsWith(
      "/>=4.0.0|<4.2.11.2|>=5.2.0|<5.3"))
    assert(ap.fixed_vers.endsWith("/=4.2.11.2|=5.2.1"))
    assert(a.date_published.get.toString.startsWith("2024-01-20"))
    assert(a.url ==
      "https://gitlab.com/gitlab-org/advisories-community/-/blob/main/" +
        "gem/actionpack/CVE-2030-7777.yml")
  }

  test("maven advisory parses interval notation (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = GitlabIngest.parse(sp,
      Seq(("gitlab", "maven/com.acme/widget-core/CVE-2030-8888.yml",
        mavenYaml)).toDF("datasource_id", "path", "yaml")).collect()
    val a = rows.head
    val ap = a.affected.head
    assert(ap.purl == "pkg:maven/com.acme/widget-core")
    assert(ap.affecting_vers == "vers:maven/<9.1.6")
    assert(ap.fixed_vers == "vers:maven/=9.1.6")
    // no severities block -> empty, summary still built
    assert(a.severities.isEmpty)
  }

  test("unknown scheme keeps advisory without affected; empty drops (S2)") {
    val sp = spark
    import sp.implicits._
    val goYaml =
      """---
        |identifier: "CVE-2030-9999"
        |package_slug: "go/golang.org/x/net"
        |title: "t"
        |description: "d"
        |pubdate: "2024-01-01"
        |affected_range: "<0.7.0"
        |identifiers:
        |- "CVE-2030-9999"
        |""".stripMargin
    val rows = GitlabIngest.parse(sp,
      Seq(("gitlab", "go/golang.org/x/net/CVE-2030-9999.yml", goYaml))
        .toDF("datasource_id", "path", "yaml")).collect()
    // `go` slugs map to golang purls (the captured v1 golang fixture
    // proves the mapping; the reference's v2 map merely defers it)
    assert(rows.length == 1)
    assert(rows.head.affected.head.purl == "pkg:golang/golang.org/x/net")
    assert(rows.head.affected.head.affecting_vers == "vers:golang/<0.7.0")

    val noRanges = gemYaml.linesIterator
      .filterNot(l => l.startsWith("affected_range") || l.startsWith("- \"4") ||
        l.startsWith("- \"5") || l.startsWith("fixed_versions"))
      .mkString("\n")
    val dropped = GitlabIngest.parse(sp,
      Seq(("gitlab", "gem/actionpack/CVE-2030-7777.yml", noRanges))
        .toDF("datasource_id", "path", "yaml")).collect()
    assert(dropped.isEmpty) // valid purl + nothing parseable -> dropped
  }
}

class RedhatIngestSpec extends AnyFunSuite with SparkTestSession {
  private val csaf =
    """{"document":{"csaf_version":"2.0",
      |"aggregate_severity":{"text":"Important"},
      |"notes":[{"category":"summary","text":"Kernel update."},
      |         {"category":"legal_disclaimer","text":"legal text"}],
      |"references":[
      |  {"category":"self","summary":"https://access.redhat.com/errata/RHSA-2030:0001",
      |   "url":"https://access.redhat.com/errata/RHSA-2030:0001"},
      |  {"category":"external","summary":"bz#123 kernel flaw",
      |   "url":"https://bugzilla.redhat.com/show_bug.cgi?id=123"}],
      |"tracking":{"id":"RHSA-2030:0001",
      |            "initial_release_date":"2030-01-01T09:00:00+00:00"}},
      |"vulnerabilities":[{"cve":"CVE-2030-9"}],
      |"product_tree":{"branches":[{"branches":[
      |  {"category":"product_family","branches":[]},
      |  {"category":"architecture","branches":[
      |    {"product":{"product_identification_helper":
      |      {"purl":"pkg:rpm/redhat/kernel@5.14.0-70.13.1.el9_0?arch=src"}}},
      |    {"product":{"product_identification_helper":
      |      {"purl":"pkg:rpmmod/redhat/python36@3.6"}}},
      |    {"product":{"product_identification_helper":
      |      {"purl":"pkg:rpm/redhat/kernel-doc@5.14.0-70.13.1.el9_0?arch=noarch"}}},
      |    {"product":{"product_identification_helper":
      |      {"purl":"pkg:rpm/redhat/versionless"}}}]}]}]}}"""
      .stripMargin.replaceAll("\n", "")

  test("CSAF advisory parses: notes, refs, aggregate severity, rpms (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = RedhatIngest.parse(sp,
      Seq(("redhat", csaf)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "RHSA-2030:0001")
    assert(a.aliases == Seq("CVE-2030-9"))
    assert(a.summary == "Kernel update.") // legal_disclaimer dropped
    assert(a.severities.map(s => (s.scoring_system, s.value)) ==
      Seq(("rhas", "Important")))
    val refTypes = a.references.map(r => r.url -> r.reference_type).toMap
    assert(refTypes("https://access.redhat.com/errata/RHSA-2030:0001")
      == "advisory")
    assert(refTypes("https://bugzilla.redhat.com/show_bug.cgi?id=123")
      == "bug")
    assert(a.references.find(_.reference_type == "bug").get.reference_id
      == "bz#123 kernel flaw")
    // rpmmod and versionless purls drop; both arches keep their own name
    val byPurl = a.affected.map(p => p.purl -> p).toMap
    assert(byPurl.keySet == Set("pkg:rpm/redhat/kernel?arch=src",
      "pkg:rpm/redhat/kernel-doc?arch=noarch"))
    assert(byPurl("pkg:rpm/redhat/kernel?arch=src").affecting_vers ==
      "vers:rpm/<5.14.0-70.13.1.el9_0")
    assert(byPurl("pkg:rpm/redhat/kernel?arch=src").fixed_vers ==
      "vers:rpm/=5.14.0-70.13.1.el9_0")
    assert(a.date_published.get.toString.startsWith("2030-01-01"))
  }

  test("unsupported CSAF version is rejected (S2)") {
    val sp = spark
    import sp.implicits._
    val bad = csaf.replace("\"csaf_version\":\"2.0\"",
      "\"csaf_version\":\"2.1\"")
    assert(RedhatIngest.parse(sp,
      Seq(("redhat", bad)).toDF("datasource_id", "json")).collect().isEmpty)
  }
}
