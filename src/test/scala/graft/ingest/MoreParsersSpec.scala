package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ssvc
import graft.operators.SparkTestSession

class SsvcCalculatorSpec extends AnyFunSuite {
  test("ssvc_calculator ground truth (test_vulnrichment.py:38-69)") {
    assert(Ssvc.calculator(
      Seq("Exploitation" -> "poc", "Automatable" -> "no",
        "Technical Impact" -> "partial"),
      Some("2024-05-28T15:58:04Z")) ==
      Some(("SSVCv2/E:P/A:N/T:P/P:M/B:A/M:M/D:T/2024-05-28T15:58:04Z/",
        "Track")))
    assert(Ssvc.calculator(
      Seq("Exploitation" -> "active", "Automatable" -> "no",
        "Technical Impact" -> "total",
        "Mission Prevalence" -> "Minimal",
        "Public Well-being Impact" -> "Material",
        "Mission & Well-being" -> "medium"),
      Some("2024-05-28T15:58:04Z")) ==
      Some(("SSVCv2/E:A/A:N/T:T/P:M/B:A/M:M/D:A/2024-05-28T15:58:04Z/",
        "Attend")))
  }

  test("decision table matches the CISA guide cells round 1 got wrong") {
    assert(Ssvc.decision("active", "no", "partial", "low") == "Track")
    assert(Ssvc.decision("active", "no", "partial", "medium") == "Track")
    assert(Ssvc.decision("active", "no", "total", "low") == "Track")
    assert(Ssvc.decision("none", "yes", "total", "medium") == "Track")
    assert(Ssvc.decision("active", "no", "total", "medium") == "Attend")
    assert(Ssvc.decision("poc", "no", "total", "medium") == "Track*")
  }

  test("python-dict vector layout: in-place M&W overwrite, dup keys") {
    // a given Mission & Well-being keeps its input SLOT but is always
    // recomputed (utils.py:785-787 overwrites in the dict, which
    // preserves insertion position): here (minimal, material) -> medium
    // replaces the given 'low' at position 2
    assert(Ssvc.calculator(
      Seq("Exploitation" -> "none", "Mission & Well-being" -> "low",
        "Automatable" -> "no", "Technical Impact" -> "total")) ==
      Some(("SSVCv2/E:N/M:M/A:N/T:T/P:M/B:A/D:T/", "Track")))
    // duplicate option names collapse like a python dict: LAST value
    // wins, FIRST occurrence's position kept
    assert(Ssvc.calculator(
      Seq("Exploitation" -> "none", "Automatable" -> "no",
        "Exploitation" -> "active", "Technical Impact" -> "total")) ==
      Some(("SSVCv2/E:A/A:N/T:T/P:M/B:A/M:M/D:A/", "Attend")))
  }
}

class AlpineIngestSpec extends AnyFunSuite with SparkTestSession {
  private val secdb =
    """{"archs": ["x86_64", "aarch64"], "reponame": "main",
      |"distroversion": "v3.19",
      |"packages": [{"pkg": {"name": "xen", "secfixes": {
      |  "4.10.0-r2": ["CVE-2030-7540 XSA-252"],
      |  "4.10.0-r1": ["XSA-248_someting (oddball)"],
      |  "0": ["notvalid"]
      |}}}]}""".stripMargin.replaceAll("\n", "")

  test("secdb explodes to per-(pkg, version, vuln) advisories (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = AlpineIngest.parse(sp,
      Seq(("alpine_linux", secdb)).toDF("datasource_id", "json"))
      .collect().map(a => a.advisory_id -> a).toMap
    // the "notvalid" id row drops entirely; the parenthetical is removed
    // and the _ suffix cleaned
    assert(rows.keySet == Set(
      "xen/v3.19/4.10.0-r2/CVE-2030-7540",
      "xen/v3.19/4.10.0-r1/XSA-248-someting"))
    val cveRow = rows("xen/v3.19/4.10.0-r2/CVE-2030-7540")
    assert(cveRow.aliases == Seq("CVE-2030-7540", "XSA-252"))
    assert(cveRow.references.map(_.url) ==
      Seq("https://nvd.nist.gov/vuln/detail/CVE-2030-7540"))
    assert(cveRow.affected.map(_.purl).sorted == Seq(
      "pkg:apk/alpine/xen?arch=aarch64&distroversion=v3.19&reponame=main",
      "pkg:apk/alpine/xen?arch=x86_64&distroversion=v3.19&reponame=main"))
    assert(cveRow.affected.head.fixed_vers == "vers:apk/=4.10.0-r2")
    val xsaRow = rows("xen/v3.19/4.10.0-r1/XSA-248-someting")
    assert(xsaRow.references.head.url ==
      "https://xenbits.xen.org/xsa/advisory-someting.html")
  }
}

class NginxIngestSpec extends AnyFunSuite with SparkTestSession {
  private val page =
    """<html><body><ul>
      |<li><p>Buffer overwrite in HTTP/3<br>Severity: medium<br>
      |<a href="https://mailman.nginx.org/pipermail/ann/X.html">Advisory</a><br>
      |<a href="https://www.cve.org/CVERecord?id=CVE-2030-32760">CVE-2030-32760</a><br>
      |Not vulnerable: 1.27.0+, 1.26.1+<br>
      |Vulnerable: 1.25.0-1.25.5, 1.26.0</p></li>
      |<li><p>Windows directory traversal<br>Severity: major<br>
      |<a href="/download/patch.2009.dav.txt">The patch</a><br>
      |<a href="http://cve.mitre.org/cgi-bin/cvename.cgi?name=CVE-2030-3898">CVE-2030-3898</a><br>
      |Not vulnerable: 0.8.41+<br>
      |Vulnerable: nginx/Windows 0.7.52-0.8.40</p></li>
      |</ul></body></html>""".stripMargin.replaceAll("\n", "")

  test("security advisories page parses per-paragraph (S2, V5 inputs)") {
    val sp = spark
    import sp.implicits._
    val rows = NginxIngest.parse(sp,
      Seq(("nginx", page)).toDF("datasource_id", "html"))
      .collect().map(a => a.advisory_id -> a).toMap
    assert(rows.keySet == Set("CVE-2030-32760", "CVE-2030-3898"))

    val h3 = rows("CVE-2030-32760")
    assert(h3.summary == "Buffer overwrite in HTTP/3")
    assert(h3.severities.map(s => (s.scoring_system, s.value)) ==
      Seq(("generic_textual", "medium")))
    val ap = h3.affected.head
    assert(ap.purl == "pkg:nginx/nginx")
    assert(ap.affecting_vers ==
      "vers:nginx/>=1.25.0|<=1.25.5|=1.26.0")
    // branch-aware `+`: 1.26 is a stable branch so 1.26.1+ stops at the
    // next branch; 1.27 is mainline, open-ended (matches the captured
    // nginx_v2 expected output for the same token pattern)
    assert(ap.fixed_vers == "vers:nginx/>=1.26.1|<1.27.0|>=1.27.0")
    assert(h3.references.exists(r =>
      r.url == "https://nvd.nist.gov/vuln/detail/CVE-2030-32760"))
    assert(h3.references.exists(_.url.contains("mailman")))

    val win = rows("CVE-2030-3898")
    assert(win.affected.head.purl == "pkg:nginx/nginx?os=windows")
    assert(win.affected.head.affecting_vers ==
      "vers:nginx/>=0.7.52|<=0.8.40")
    assert(win.references.exists(r => r.reference_type == "patch" &&
      r.url == "https://nginx.org/download/patch.2009.dav.txt"))
    // an anchor whose text IS the CVE id takes the alias branch (the
    // reference keeps the nvd link, not the mitre href —
    // nginx_importer.py:212-219)
    assert(win.references.exists(r => r.reference_type == "advisory" &&
      r.url == "https://nvd.nist.gov/vuln/detail/CVE-2030-3898"))
    assert(!win.references.exists(_.url.contains("cve.mitre.org")))
  }
}

class VulnrichmentIngestSpec extends AnyFunSuite with SparkTestSession {
  private val cve =
    """{"cveMetadata": {"cveId": "CVE-2030-4901", "state": "PUBLISHED",
      |  "datePublished": "2030-06-26T23:31:05.422Z"},
      |"containers": {"cna": {
      |  "descriptions": [{"lang": "en", "value": "Stored XSS in widget."}],
      |  "metrics": [{"cvssV3_1": {
      |    "vectorString": "CVSS:3.1/AV:N/AC:L/PR:L/UI:R/S:C/C:H/I:H/A:N",
      |    "baseScore": 8.7}}],
      |  "affected": [{"cpes": ["cpe:2.3:a:acme:widget:*:*:*:*:*:*:*:*"]}],
      |  "references": [
      |    {"url": "https://acme.example/issues/461773",
      |     "tags": ["issue-tracking", "permissions-required"]},
      |    {"url": "https://hackerone.example/reports/2508114"}],
      |  "problemTypes": [{"descriptions": [
      |    {"cweId": "CWE-79", "description": "XSS"},
      |    {"description": "see CWE-80 text"}]}]},
      |"adp": [{"metrics": [{"other": {"type": "ssvc", "content": {
      |  "options": [{"Exploitation": "none"}, {"Automatable": "no"},
      |              {"Technical Impact": "total"}],
      |  "timestamp": "2030-06-28T03:55:15.710247Z"}}}]}]}}"""
      .stripMargin.replaceAll("\n", "")

  test("CVE 5.x record parses: cvss + ssvc metrics, cpes, weaknesses (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = VulnrichmentIngest.parse(sp,
      Seq(("vulnrichment", cve)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-4901")
    assert(a.summary == "Stored XSS in widget.")
    assert(a.weaknesses == Seq(79, 80))
    val sevs = a.severities.map(s => s.scoring_system -> s).toMap
    assert(sevs("cvssv3.1").value == "8.7")
    assert(sevs("cvssv3.1").scoring_elements
      .startsWith("CVSS:3.1/AV:N"))
    // ssvc: E:none/A:no/T:total -> M&W defaults to medium -> Track
    assert(sevs("ssvc").value == "Track")
    assert(sevs("ssvc").scoring_elements ==
      "SSVCv2/E:N/A:N/T:T/P:M/B:A/M:M/D:T/2030-06-28T03:55:15Z/")
    assert(a.references.exists(r => r.reference_type == "bug" &&
      r.reference_id == "461773"))
    assert(a.references.exists(r => r.reference_type == "other" &&
      r.reference_id == "2508114"))
    assert(a.references.exists(r =>
      r.reference_id.startsWith("cpe:2.3:a:acme")))
    // feeds the SSVC mart end-to-end
    val ssvc = graft.derive.AdvisoryDerive.ssvcDecisions(
      graft.derive.AdvisoryDerive.withContentIdAndLatest(
        Seq(a).toDF()))
    assert(ssvc.collect().head.getAs[String]("decision") == "Track")
  }

  private val cve2 =
    """{"cveMetadata": {"cveId": "CVE-2030-4902", "state": "PUBLISHED",
      |  "datePublished": "2030-06-26T23:31:05.422Z"},
      |"containers": {"cna": {
      |  "descriptions": [{"lang": "en", "value": "Overflow."}],
      |  "references": [
      |    {"url": "https://a.example/adv/1",
      |     "tags": ["vendor-advisory", "exploit"]},
      |    {"url": "https://b.example/adv/2",
      |     "tags": ["exploit", "vendor-advisory"]}],
      |  "problemTypes": [{"descriptions": [
      |    {"cweId": "CWE-89", "description": "variant of CWE-90"},
      |    {"cweId": "NVD-CWE-noinfo", "description": "see CWE-91"}]}]}}}"""
      .stripMargin.replaceAll("\n", "")

  test("tag order + dual CWE extraction (vulnrichment_importer.py:161,184)") {
    val sp = spark
    import sp.implicits._
    val a = VulnrichmentIngest.parse(sp,
      Seq(("vulnrichment", cve2)).toDF("datasource_id", "json"))
      .collect().head
    // the LAST mapped tag in data order wins, like the reference's loop:
    // [vendor-advisory, exploit] -> exploit; [exploit, vendor-advisory]
    // -> advisory
    val byId = a.references.map(r => r.reference_id -> r.reference_type).toMap
    assert(byId("1") == "exploit")
    assert(byId("2") == "advisory")
    // BOTH the cweId-derived and description-derived CWE are kept per
    // description, and a non-CWE cweId ('NVD-CWE-noinfo') doesn't mask
    // the description fallback
    assert(a.weaknesses == Seq(89, 90, 91))
  }
}

class SuseScoreIngestSpec extends AnyFunSuite with SparkTestSession {
  private val feed =
    """---
      |CVE-2030-0230:
      |  cvss:
      |    - version: 2.0
      |      score: 4.3
      |      vector: AV:N/AC:M/Au:N/C:N/I:N/A:P
      |    - version: 3.1
      |      score: 3.7
      |      vector: CVSS:3.1/AV:N/AC:H/PR:N/UI:N/S:U/C:N/I:N/A:L
      |CVE-2030-1605:
      |  cvss:
      |    - version: 5
      |      score: 9.9
      |      vector: CVSS:5.0/whatever
      |    - version: 4
      |      score: 9.3
      |      vector: CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N
      |""".stripMargin

  test("suse scores map to per-CVE severity advisories (S2)") {
    val sp = spark
    import sp.implicits._
    val ds = SuseScoreIngest.parse(sp,
      Seq(("suse_score", feed)).toDF("datasource_id", "yaml"))
    val rows = ds.collect().map(a => a.advisory_id -> a).toMap
    assert(rows.keySet == Set("CVE-2030-0230", "CVE-2030-1605"))
    assert(rows("CVE-2030-0230").severities
      .map(s => (s.scoring_system, s.value)).toSet ==
      Set(("cvssv2", "4.3"), ("cvssv3.1", "3.7")))
    // unsupported version 5 dropped, v4 kept
    assert(rows("CVE-2030-1605").severities
      .map(_.scoring_system) == Seq("cvssv4"))

    val donors = SuseScoreIngest.donors(ds).collect()
    assert(donors.length == 3)
    val d = donors.find(_.getAs[String]("scoring_system") == "cvssv4").get
    assert(d.getAs[String]("match_key") == "CVE-2030-1605")
    assert(d.getAs[Double]("score") == 9.3)
  }
}

class CurlIngestSpec extends AnyFunSuite with SparkTestSession {
  private val entry =
    """{"id": "CURL-CVE-2030-27536",
      |"aliases": ["CVE-2030-27536"],
      |"summary": "GSS delegation too eager",
      |"published": "2030-03-20T08:00:00.00Z",
      |"affected": [{"versions": ["7.86.0", "7.87.0", "7.88.0"],
      |  "ranges": [{"type": "SEMVER",
      |    "events": [{"introduced": "7.86.0"}, {"fixed": "7.88.1"}]}]}],
      |"database_specific": {
      |  "www": "https://curl.se/docs/CVE-2030-27536.html",
      |  "issue": "https://hackerone.example/reports/1895135",
      |  "URL": "https://curl.se/docs/CVE-2030-27536.json",
      |  "severity": "Low",
      |  "CWE": {"id": "CWE-305"}}}"""
      .stripMargin.replaceAll("\n", "")

  test("curl OSV-variant parses pins, fixed event and db-specific (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = CurlIngest.parse(sp,
      Seq(("curl", entry)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CURL-CVE-2030-27536")
    assert(a.aliases == Seq("CVE-2030-27536"))
    assert(a.weaknesses == Seq(305))
    val ap = a.affected.head
    assert(ap.purl == "pkg:generic/curl.se/curl")
    assert(ap.affecting_vers == "vers:generic/=7.86.0|=7.87.0|=7.88.0")
    assert(ap.fixed_vers == "vers:generic/=7.88.1")
    assert(a.references.map(_.reference_type).sorted == Seq("advisory", "bug"))
    assert(a.severities.head.value == "Low")
    assert(a.url == "https://curl.se/docs/CVE-2030-27536.json")

    // non-CVE first alias is skipped like the reference
    val bad = entry.replace("CVE-2030-27536\"]", "WHAT-1\"]")
    assert(CurlIngest.parse(sp,
      Seq(("curl", bad)).toDF("datasource_id", "json")).collect().isEmpty)
  }
}

class ArchIngestSpec extends AnyFunSuite with SparkTestSession {
  private val feed =
    """[{"name": "AVG-2030",
      |"packages": ["chromium", "electron"],
      |"severity": "Critical",
      |"type": "arbitrary code execution",
      |"affected": "89.0.4389.114-1",
      |"fixed": "90.0.4430.72-1",
      |"issues": ["CVE-2030-21227"],
      |"advisories": ["ASA-202104-1"]},
      |{"name": "AVG-2031",
      |"packages": ["vim"],
      |"severity": "Totally Made Up",
      |"type": "unknown",
      |"affected": "8.2", "fixed": null,
      |"issues": ["CVE-2030-9"], "advisories": []}]"""
      .stripMargin.replaceAll("\n", "")

  test("AVG records explode to per-package pins (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = ArchIngest.parse(sp,
      Seq(("archlinux", feed)).toDF("datasource_id", "json"))
      .collect().map(a => a.advisory_id -> a).toMap
    val a = rows("AVG-2030")
    assert(a.aliases == Seq("CVE-2030-21227", "ASA-202104-1"))
    assert(a.summary == "arbitrary code execution")
    assert(a.affected.map(_.purl) ==
      Seq("pkg:alpm/archlinux/chromium", "pkg:alpm/archlinux/electron"))
    assert(a.affected.head.affecting_vers == "vers:alpm/=89.0.4389.114-1")
    assert(a.affected.head.fixed_vers == "vers:alpm/=90.0.4430.72-1")
    assert(a.severities.map(_.value) == Seq("Critical"))
    assert(a.references.map(_.reference_id) == Seq("AVG-2030", "ASA-202104-1"))
    // unknown severity text drops; unknown type blanks the summary;
    // null fixed leaves an empty pin list
    val b = rows("AVG-2031")
    assert(b.severities.isEmpty)
    assert(b.summary == "")
    assert(b.affected.head.fixed_vers == "vers:alpm/")
  }
}

class ApacheHttpdIngestSpec extends AnyFunSuite with SparkTestSession {
  private val cve =
    """{"CVE_data_meta": {"ID": "CVE-2030-28614"},
      |"description": {"description_data": [
      |  {"lang": "eng", "value": "read beyond bounds via ap_rwrite()"}]},
      |"impact": [{"other": "low"}],
      |"problemtype": {"problemtype_data": [
      |  {"description": [{"lang": "eng",
      |    "value": "CWE-190 Integer Overflow"}]},
      |  {"description": [{"lang": "eng",
      |    "value": "CWE-200 Exposure of Sensitive Information"}]}]},
      |"affects": {"vendor": {"vendor_data": [
      |  {"product": {"product_data": [
      |    {"version": {"version_data": [
      |      {"version_value": "2.4.0", "version_affected": ">="},
      |      {"version_value": "2.4.53", "version_affected": "<="},
      |      {"version_value": "APACHE_1_2b1", "version_affected": "="},
      |      {"version_value": "1.0", "version_affected": "?="}]}}]}}]}},
      |"timeline": [
      |  {"time": "2030-06-08", "value": "public"},
      |  {"time": "2030-06-09", "value": "2.4.54 release"},
      |  {"time": "2030-06-10", "value": "never release 1.x"}]}"""
      .stripMargin.replaceAll("\n", "")

  test("CVE 4.0 record parses: constraints, inverted fix, severity (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = ApacheHttpdIngest.parse(sp,
      Seq(("apache_httpd", cve)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-28614")
    assert(a.summary.startsWith("read beyond bounds"))
    assert(a.severities.map(s => (s.scoring_system, s.value)) ==
      Seq(("apache_httpd", "low")))
    assert(a.weaknesses == Seq(190, 200))
    val ap = a.affected.head
    assert(ap.purl == "pkg:apache/httpd")
    // svn-tag and ?= rows dropped; timeline release inverts to !=
    assert(ap.affecting_vers == "vers:semver/>=2.4.0|<=2.4.53|!=2.4.54")
    assert(ap.fixed_vers == "vers:semver/=2.4.54")
    assert(a.date_published.get.toString.startsWith("2030-06-08"))
  }
}

class FixCommitsIngestSpec extends AnyFunSuite with SparkTestSession {
  test("commit log groups CVE/GHSA mentions into per-vuln advisories (S2)") {
    val sp = spark
    import sp.implicits._
    val commits = Seq(
      ("aaa111", "fix heap overflow\n\nFixes cve-2030-1111 in resolver"),
      ("bbb222", "backport CVE-2030-1111 fix to 4.x"),
      ("ccc333", "patch GHSA-qqqq-wwww-rrrr plus CVE-2030-2222"),
      ("ddd444", "unrelated refactor"))
      .toDF("commit_hash", "message")
    val rows = FixCommitsIngest.fromCommits(sp, commits,
      "https://github.com/torvalds/linux", "linux_fix_commits")
      .collect().map(a => a.advisory_id -> a).toMap
    // case-insensitive match; CVEs canonicalize UPPER, GHSA ids keep
    // their canonical lowercase groups (so they join GithubIngest's
    // ghsaId for the same advisory); one advisory per vuln
    assert(rows.keySet ==
      Set("CVE-2030-1111", "CVE-2030-2222", "GHSA-qqqq-wwww-rrrr"))
    val a = rows("CVE-2030-1111")
    assert(a.references.map(_.reference_id).sorted == Seq("aaa111", "bbb222"))
    assert(a.references.head.url.startsWith(
      "https://github.com/torvalds/linux/tree/"))
    assert(a.affected.map(_.purl).distinct == Seq("pkg:github/torvalds/linux"))
    assert(a.summary.contains("aaa111:fix heap overflow"))

    val links = FixCommitsIngest.commitLinks(sp, commits,
      "https://github.com/torvalds/linux", "linux_fix_commits").collect()
    assert(links.length == 4) // (2 + 1 + 1) vuln-commit pairs
    assert(links.forall(_.getAs[String]("vcs_url") ==
      "https://github.com/torvalds/linux"))
  }

  test("project registry mirrors the reference's 37 fix-commit pipelines") {
    assert(FixCommitsIngest.Projects.size == 37)
    assert(FixCommitsIngest.Projects("collect_qemu_fix_commits")._2 ==
      "https://gitlab.com/qemu-project/qemu")
    assert(FixCommitsIngest.purlForRepo("https://gitlab.com/wireshark/wireshark")
      .contains("pkg:gitlab/wireshark/wireshark"))
  }
}

class ImporterRegistrySpec extends AnyFunSuite {
  test("registry covers the reference pipelines; support ratio is honest") {
    val total = ImporterRegistry.registry.size
    val done = ImporterRegistry.implemented.size
    val missing = ImporterRegistry.missing.size
    assert(total == done + missing)
    assert(total >= 80, s"expected the full pipeline inventory, got $total")
    // all fix-commit pipelines route to the shared operator
    FixCommitsIngest.Projects.keys.foreach { pid =>
      assert(ImporterRegistry.implemented.contains(pid), pid)
    }
    // every pipeline in the registry now has a working reader
    assert(missing == 0, s"unexpected Missing rows: $missing")
    // the reference-abandoned v1 importers are implemented anyway (an
    // old deployment can replay these feeds), but stay in a separate
    // table so the registry is honest about the reference's active set
    assert(ImporterRegistry.legacyV1.keySet ==
      Set("gsd", "kaybee", "rust", "suse_backports", "ubuntu_usn"))
    assert(ImporterRegistry.legacyV1.values.forall {
      case (_, ImporterRegistry.Dedicated(entry)) => entry.nonEmpty
      case _ => false
    })
    // the improver-side registry delta self-documents the same way:
    // the only reference improver file outside IMPROVERS_REGISTRY is
    // add_missing_refid, and its entry names the engine operator
    assert(graft.derive.Improvers.unregisteredReferenceImprovers ==
      Map("add_missing_refid" ->
        "not in IMPROVERS_REGISTRY; implemented as Improvers.cveIdBackfill"))
    // the derive-side pipelines resolve too (the recompute model): every
    // reference pipeline_id that is not an importer maps to a derivation
    Seq("remove_duplicate_advisories", "compute_advisory_todo_v2",
      "compute_package_risk_v2", "compute_version_rank_v2",
      "flag_ghost_packages_v2", "group_advisories_for_packages",
      "populate_vulnerability_summaries", "relate_severities_v2",
      "unfurl_version_range_v2", "mark_unfurl_version_range_v2",
      "collect_fix_commits_v2", "collect_ref_fix_commits_v2",
      "federate_vulnerabilities_v2", "archive_improver_pipeline",
      "add_cvssv3.1_to_CVEs", "npm_importer").foreach { pid =>
      assert(ImporterRegistry.implemented.contains(pid), pid)
    }
  }

  test("golden: every ACTIVE reference pipeline_id resolves, verbatim") {
    // the fixture is the reference's IMPORTERS_REGISTRY class list
    // (importers/__init__.py:57-133) resolved to pipeline_id attributes —
    // regenerating it requires re-reading the reference, so drift in
    // either direction (a reference id we dropped, or an id we renamed)
    // fails here with the exact offending id
    val src = java.nio.file.Paths.get(
      "src/test/resources/reference_importer_pipeline_ids.txt")
    val ids = java.nio.file.Files.readString(src).split("\n").toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    assert(ids.size == 73, s"fixture should hold 73 active ids, got ${ids.size}")
    val unresolved = ids.filterNot(ImporterRegistry.implemented.contains)
    assert(unresolved.isEmpty,
      s"reference pipelines with no engine mapping: ${unresolved.mkString(", ")}")
  }
}

class SmallFeedsSpec extends AnyFunSuite with SparkTestSession {
  test("xen xsa.json explodes to XSA advisories (S2)") {
    val sp = spark
    import sp.implicits._
    val feed =
      """[{"xsas": [
        |{"xsa": "468", "title": "x86: PV guest escape",
        | "public_time": "2030-05-12T11:00:00Z",
        | "cve": ["CVE-2030-1713"]},
        |{"xsa": null, "title": "placeholder"}]}]"""
        .stripMargin.replaceAll("\n", "")
    val rows = XenIngest.parse(sp,
      Seq(("xen", feed)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    assert(rows.head.advisory_id == "XSA-468")
    assert(rows.head.aliases == Seq("CVE-2030-1713"))
    assert(rows.head.references.head.url ==
      "https://xenbits.xen.org/xsa/advisory-468.html")
  }

  test("retiredotnet groups packages and extracts the CVE alias (S2)") {
    val sp = spark
    import sp.implicits._
    val doc =
      """{"description": "RCE described in CVE-2030-1302 for widget",
        |"link": "https://example.org/adv/1302",
        |"packages": [
        |  {"id": "Widget.Core", "affected": "1.0.0"},
        |  {"id": "Widget.Core", "affected": "1.1.0", "fix": "1.2.0"},
        |  {"id": "Other.Pkg", "fix": "2.0.1"},
        |  {"id": null, "affected": "9.9"}]}"""
        .stripMargin.replaceAll("\n", "")
    val rows = RetireDotnetIngest.parse(sp,
      Seq(("retiredotnet", "Content/2030-01.json", doc))
        .toDF("datasource_id", "path", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "retiredotnet-2030-01")
    assert(a.aliases == Seq("CVE-2030-1302"))
    val byPurl = a.affected.map(p => p.purl -> p).toMap
    assert(byPurl.keySet == Set("pkg:nuget/Widget.Core", "pkg:nuget/Other.Pkg"))
    assert(byPurl("pkg:nuget/Widget.Core").affecting_vers ==
      "vers:nuget/=1.0.0|=1.1.0")
    assert(byPurl("pkg:nuget/Widget.Core").fixed_vers == "vers:nuget/=1.2.0")
    assert(byPurl("pkg:nuget/Other.Pkg").fixed_vers == "vers:nuget/=2.0.1")
  }

  test("nodejs security-wg advisory parses npm ranges + sentinels (S2)") {
    val sp = spark
    import sp.implicits._
    val doc =
      """{"id": "213", "title": "Prototype pollution in widget",
        |"overview": "long text",
        |"created_at": "2030-04-01T00:00:00.000Z",
        |"cvss_vector": "CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:H/A:N",
        |"cvss_score": "7.5",
        |"module_name": "widget",
        |"vulnerable_versions": "<1.2.3 || >=2.0.0 <2.0.5",
        |"patched_versions": ">=1.2.3 <2.0.0 || >=2.0.5",
        |"cves": ["CVE-2030-4444"],
        |"references": ["https://hackerone.example/reports/5"]}"""
        .stripMargin.replaceAll("\n", "")
    val rows = NodeSecurityIngest.parse(sp,
      Seq(("npm", doc)).toDF("datasource_id", "json")).collect()
    val a = rows.head
    // npm-<id> per the v2 pipeline's AdvisoryDataV2
    // (npm_importer.py:131)
    assert(a.advisory_id == "npm-213")
    assert(a.aliases == Seq("CVE-2030-4444"))
    assert(a.severities.map(_.scoring_system) == Seq("cvssv3"))
    val ap = a.affected.head
    assert(ap.purl == "pkg:npm/widget")
    assert(ap.affecting_vers == "vers:semver/<1.2.3|>=2.0.0|<2.0.5")
    assert(ap.fixed_vers == "vers:semver/>=1.2.3|<2.0.0|>=2.0.5")

    // sentinel handling: full-range marker and impossible patch range
    val sentinel = doc
      .replace("<1.2.3 || >=2.0.0 <2.0.5", "<=99.999.99999")
      .replace(">=1.2.3 <2.0.0 || >=2.0.5", "<0.0.0")
    val b = NodeSecurityIngest.parse(sp,
      Seq(("npm", sentinel)).toDF("datasource_id", "json")).collect().head
    assert(b.affected.head.affecting_vers == "vers:semver/*")
    assert(b.affected.head.fixed_vers == "vers:semver/")
  }
}

class MozillaIngestSpec extends AnyFunSuite with SparkTestSession {
  private val yml =
    """announced: March 19, 2030
      |impact: Critical
      |fixed_in:
      |  - Firefox 124.0.1
      |  - Firefox ESR 115.9.1
      |description: |
      |  <p>Out of bound write in the JIT.</p>
      |advisories:
      |  CVE-2030-29943:
      |    title: oob range analysis
      |    impact: critical
      |    description: |
      |      <p>Range analysis OOB read.</p>
      |  not-a-cve:
      |    impact: low
      |    description: ignored
      |""".stripMargin

  private val md =
    """---
      |announced: 2030-01-09
      |impact: High
      |fixed_in:
      |  - Thunderbird 115.6.1
      |---
      |
      |### Description
      |
      |A heap overflow when parsing mail headers.
      |
      |More detail here.
      |
      |### Acknowledgements
      |ignored
      |""".stripMargin

  test("yml advisory fans out per CVE; md takes the Description body (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = MozillaIngest.parse(sp, Seq(
      ("mozilla", "announce/2030/mfsa2030-15.yml", yml),
      ("mozilla", "announce/2030/mfsa2030-01.md", md),
      ("mozilla", "announce/2030/notmatching.txt", "junk"))
      .toDF("datasource_id", "path", "text"))
      .collect().map(a => a.advisory_id -> a).toMap
    // non-CVE advisory key dropped; yml with advisories -> per-CVE rows
    assert(rows.keySet == Set("mfsa2030-15/CVE-2030-29943", "mfsa2030-01"))
    val y = rows("mfsa2030-15/CVE-2030-29943")
    assert(y.aliases == Seq("CVE-2030-29943"))
    assert(y.summary.contains("Out of bound write"))
    assert(y.summary.contains("Range analysis OOB read."))
    assert(y.severities.map(_.value) == Seq("critical"))
    assert(y.affected.map(_.purl) ==
      Seq("pkg:mozilla/Firefox", "pkg:mozilla/Firefox ESR"))
    assert(y.affected.head.fixed_vers == "vers:generic/=124.0.1")

    val m = rows("mfsa2030-01")
    assert(m.summary ==
      "A heap overflow when parsing mail headers.\n\nMore detail here.")
    assert(m.severities.map(_.value) == Seq("high"))
    assert(m.affected.head.purl == "pkg:mozilla/Thunderbird")
    assert(m.date_published.get.toString.startsWith("2030-01-09"))
  }
}

class RubyElixirSpec extends AnyFunSuite with SparkTestSession {
  test("rubysec gem advisory: inverted unaffected + patched ranges (S2)") {
    val sp = spark
    import sp.implicits._
    val gemYaml =
      """---
        |gem: actionpack
        |cve: "2030-8164"
        |ghsa: "8727-m6gj"
        |url: https://groups.example/ruby-security-ann/x
        |title: "Possible Strong Parameters Bypass"
        |description: "There is a strong parameters bypass vector."
        |date: 2030-05-18
        |cvss_v3: "8.8"
        |unaffected_versions:
        |  - "< 4.0.0"
        |patched_versions:
        |  - ">= 5.2.4.3, < 6.0.0"
        |  - ">= 6.0.3.1"
        |""".stripMargin
    val rows = RubyIngest.parse(sp,
      Seq(("ruby_advisory_db", "gems/actionpack/CVE-2030-8164.yml", gemYaml))
        .toDF("datasource_id", "path", "yaml")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "gems/actionpack/CVE-2030-8164")
    assert(a.aliases == Seq("CVE-2030-8164", "GHSA-8727-m6gj"))
    assert(a.summary.startsWith("Possible Strong Parameters Bypass\n"))
    assert(a.severities.map(s => (s.scoring_system, s.value)) ==
      Seq(("cvssv3", "8.8")))
    val byKind = a.affected.map(p => p.affecting_vers -> p.fixed_vers)
    // "< 4.0.0" unaffected inverts into ">=4.0.0" affecting
    assert(byKind.contains(("vers:gem/>=4.0.0", "vers:gem/")))
    assert(byKind.contains(("vers:gem/", "vers:gem/>=5.2.4.3|<6.0.0")))
    assert(byKind.contains(("vers:gem/", "vers:gem/>=6.0.3.1")))
    // rubies subdir maps to the engine purl
    val rubies = RubyIngest.parse(sp,
      Seq(("ruby_advisory_db", "rubies/jruby/CVE-2030-1.yml",
        "---\nengine: jruby\ncve: \"2030-0001\"\npatched_versions:\n  - \">= 9.4\"\n"))
        .toDF("datasource_id", "path", "yaml")).collect().head
    assert(rubies.affected.head.purl == "pkg:ruby/jruby")
  }

  test("elixir advisory: unaffected + inverted patched constraints (S2)") {
    val sp = spark
    import sp.implicits._
    val yml =
      """---
        |package: coherence
        |cve: "2030-1000"
        |link: https://github.com/x/coherence/issues/270
        |description: "Privilege escalation in coherence."
        |patched_versions:
        |  - "~> 0.5.2"
        |unaffected_versions:
        |  - "< 0.5.0"
        |""".stripMargin
    val rows = ElixirIngest.parse(sp,
      Seq(("elixir_security", "packages/coherence/2030-1000.yml", yml))
        .toDF("datasource_id", "path", "yaml")).collect()
    assert(rows.length == 1)
    val a = rows.head
    // the reference keeps only the last two path segments
    // (elixir_security_importer.py:76-78)
    assert(a.advisory_id == "coherence/2030-1000")
    assert(a.aliases == Seq("CVE-2030-1000"))
    assert(a.affected.head.purl == "pkg:hex/coherence")
    // "< 0.5.0" stays; "~> 0.5.2" strips to "0.5.2" then inverts
    assert(a.affected.head.affecting_vers == "vers:semver/<0.5.0|!=0.5.2")

    // non-CVE advisory is skipped
    val noCve = yml.replace("cve: \"2030-1000\"", "cve: \"\"")
    assert(ElixirIngest.parse(sp,
      Seq(("elixir_security", "packages/coherence/x.yml", noCve))
        .toDF("datasource_id", "path", "yaml")).collect().isEmpty)
  }
}

class FixCommitDatasetsSpec extends AnyFunSuite with SparkTestSession {
  test("project-kb MSR2019 csv groups commits per vulnerability (S2)") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("kb")
    java.nio.file.Files.write(dir.resolve("vulas.csv"),
      """vuln_id,repo,sha,flag
        |CVE-2030-5005,https://github.com/apache/struts,abc123abc123,POC
        |CVE-2030-5005,https://github.com/apache/struts,def456def456,
        |CVE-2030-5005,https://github.com/apache/struts,abc123abc123,dup
        |NOVCS-1,,zzz,
        |""".stripMargin.getBytes("UTF-8"))
    val rows = FixCommitDatasetsIngest.projectKbMsr2019(sp,
      dir.resolve("vulas.csv").toString).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-5005")
    assert(a.references.map(_.reference_id) ==
      Seq("abc123abc123", "def456def456"))
    assert(a.affected.head.purl == "pkg:github/apache/struts")
  }

  test("aosp json splits comma cveIds and keeps commit refs (S2)") {
    val sp = spark
    import sp.implicits._
    val doc =
      """{"cveId": "CVE-2030-0001,CVE-2030-0002",
        |"vulnerabilityType": "EoP", "severity": "High",
        |"dateReported": "2030-02-03",
        |"fixes": [{"patchUrl": "https://android.googlesource.com/x/+/aa11",
        |           "commitId": "aa11"},
        |          {"patchUrl": null, "commitId": null}]}"""
        .stripMargin.replaceAll("\n", "")
    val rows = FixCommitDatasetsIngest.aosp(sp,
      Seq(("aosp", "cves/CVE-2030-0001.json", doc))
        .toDF("datasource_id", "path", "json")).collect()
    assert(rows.map(_.advisory_id).sorted.toSeq ==
      Seq("CVE-2030-0001", "CVE-2030-0002"))
    assert(rows.head.references.map(_.reference_id) == Seq("aa11"))
    assert(rows.head.severities.map(_.value) == Seq("High"))
  }

  test("linux kernel security.txt parses version headers + sha lines (S2)") {
    val sp = spark
    import sp.implicits._
    val txt =
      """CVEs fixed in 5.10.1:
        |  CVE-2030-29660: f4d3ff3c1d9895fb2188e0c1ed9d1b07b8
        |  CVE-2030-29661: a12b33c4
        |
        |CVEs fixed in 5.10.2:
        |  CVE-2030-29660: deadbeefdead
        |  garbage line without colon
        |""".stripMargin
    val rows = FixCommitDatasetsIngest.linuxKernelCves(sp,
      Seq(txt).toDF("text")).collect().map(a => a.advisory_id -> a).toMap
    // short sha a12b33c4 (8 chars) fails the 12+ hex guard
    assert(rows.keySet == Set("CVE-2030-29660"))
    val a = rows("CVE-2030-29660")
    assert(a.references.length == 2)
    assert(a.affected.map(_.fixed_vers).toSet ==
      Set("vers:generic/=5.10.1", "vers:generic/=5.10.2"))
  }
}

class IstioKbSpec extends AnyFunSuite with SparkTestSession {
  test("istio bulletin: front matter, release phrases, dual purls (S2)") {
    val sp = spark
    import sp.implicits._
    val md =
      """---
        |title: ISTIO-SECURITY-2030-005
        |description: Exposure of debug endpoint.
        |cves: [CVE-2030-12345, not-a-cve]
        |publishdate: 2030-06-11
        |releases: ["All releases prior to 1.5.9", "1.6.0 to 1.6.5", "1.7.0"]
        |---
        |body text""".stripMargin
    val rows = IstioIngest.parse(sp, Seq(
      ("istio", "content/en/news/security/ISTIO-SECURITY-2030-005/index.md", md),
      ("istio", "content/en/news/security/_index.md", md))
      .toDF("datasource_id", "path", "text")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "ISTIO-SECURITY-2030-005")
    assert(a.aliases == Seq("CVE-2030-12345"))
    assert(a.affected.map(_.purl) ==
      Seq("pkg:github/istio/istio", "pkg:golang/istio.io/istio"))
    assert(a.affected.head.affecting_vers ==
      "vers:semver/<1.5.9|>=1.6.0|<=1.6.5|=1.7.0")
    assert(a.affected(1).affecting_vers ==
      "vers:golang/<1.5.9|>=1.6.0|<=1.6.5|=1.7.0")
    assert(a.date_published.get.toString.startsWith("2030-06-11"))
  }

  test("project-kb statement: notes, commits, artifact pins (S2)") {
    val sp = spark
    import sp.implicits._
    val yml =
      """vulnerability_id: CVE-2030-3333
        |notes:
        |  - text: "Fixed via upstream patch."
        |    links:
        |      - https://issues.example/BUG-1
        |fixes:
        |  - id: main
        |    commits:
        |      - id: "aabbccddee112233aabb"
        |        repository: https://github.com/apache/struts
        |      - id: "not a commit"
        |        repository: https://github.com/apache/struts
        |artifacts:
        |  - id: pkg:maven/org.apache.struts/struts2-core@2.5.20
        |    affected: true
        |  - id: pkg:maven/org.apache.struts/struts2-core@2.5.22
        |    affected: false
        |  - id: not-a-purl
        |    affected: true
        |""".stripMargin
    val rows = ProjectKbStatementsIngest.parse(sp, Seq(
      ("project_kb_statements",
        "statements/CVE-2030-3333/statement.yaml", yml),
      ("project_kb_statements", "statements/other/notes.yaml", yml))
      .toDF("datasource_id", "path", "yaml")).collect()
    assert(rows.length == 1) // only statement.yaml files parse
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-3333")
    assert(a.summary == "Fixed via upstream patch.")
    assert(a.references.exists(r => r.reference_type == "fix_commit" &&
      r.reference_id == "aabbccddee112233aabb"))
    assert(a.references.exists(_.url == "https://issues.example/BUG-1"))
    assert(a.references.count(_.reference_type == "fix_commit") == 1)
    val ap = a.affected.head
    assert(ap.purl == "pkg:maven/org.apache.struts/struts2-core")
    assert(ap.affecting_vers == "vers:maven/=2.5.20")
    assert(ap.fixed_vers == "vers:maven/=2.5.22")
  }
}

class GentooGlibcSpec extends AnyFunSuite with SparkTestSession {
  test("GLSA xml: cve refs, impact severity, package ranges (S2)") {
    val sp = spark
    import sp.implicits._
    val xml =
      """<?xml version="1.0"?>
        |<glsa id="203012-07">
        |  <title>Widget: Multiple vulnerabilities</title>
        |  <synopsis>Multiple vulnerabilities were found in Widget.</synopsis>
        |  <affected>
        |    <package name="net-misc/widget" auto="yes" arch="*">
        |      <unaffected range="ge" slot="0">2.4.1</unaffected>
        |      <vulnerable range="lt">2.4.1</vulnerable>
        |    </package>
        |  </affected>
        |  <impact type="high"><p>Remote code execution.</p></impact>
        |  <references>
        |    <uri link="https://nvd.example/CVE-2030-1000">CVE-2030-1000</uri>
        |    <uri>CVE-2030-1001 extra text</uri>
        |    <uri>not a cve</uri>
        |  </references>
        |</glsa>""".stripMargin
    val rows = GentooIngest.parse(sp,
      Seq(("gentoo", xml)).toDF("datasource_id", "xml")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "GLSA-203012-07")
    assert(a.summary == "Multiple vulnerabilities were found in Widget.")
    assert(a.aliases == Seq("CVE-2030-1000", "CVE-2030-1001"))
    assert(a.severities.map(_.value) == Seq("high"))
    val byKind = a.affected.map(p =>
      (p.purl, p.affecting_vers, p.fixed_vers)).toSet
    assert(byKind == Set(
      ("pkg:ebuild/net-misc/widget?slot=0", "vers:ebuild/",
        "vers:ebuild/>=2.4.1"),
      ("pkg:ebuild/net-misc/widget", "vers:ebuild/<2.4.1",
        "vers:ebuild/")))
    // malformed xml drops, no crash
    assert(GentooIngest.parse(sp,
      Seq(("gentoo", "<glsa")).toDF("datasource_id", "xml"))
      .collect().isEmpty)
  }

  test("glibc advisory text: paragraphs + commit metadata (S2)") {
    val sp = spark
    import sp.implicits._
    val txt =
      """printf: incorrect output for integers
        |
        |When the format string contains a long width, printf may write
        |beyond the buffer.
        |
        |CVE-Id: CVE-2030-0003
        |Public-Date: 2030-01-31
        |Vulnerable-Commit: aaaa1111bbbb2222cccc (2.37)
        |Fix-Commit: dddd3333eeee4444ffff (2.39)
        |Fix-Commit: 9999888877776666aaaa (2.38-27)
        |""".stripMargin
    val rows = GlibcIngest.parse(sp, Seq(
      ("glibc", "advisories/GLIBC-SA-2030-0003", txt),
      ("glibc", "advisories/README", txt))
      .toDF("datasource_id", "path", "text")).collect()
    assert(rows.length == 1) // non-GLIBC-SA files skipped
    val a = rows.head
    assert(a.advisory_id == "GLIBC-SA-2030-0003")
    assert(a.aliases == Seq("CVE-2030-0003"))
    assert(a.summary.startsWith("printf: incorrect output"))
    assert(a.affected.head.purl == "pkg:sid/gnu.org/glibc")
    // generic-version padding: 2.37 → 2.37.0 (captured glibc expected)
    assert(a.affected.head.affecting_vers == "vers:generic/=2.37.0")
    assert(a.affected.head.fixed_vers == "vers:generic/=2.38.0-27|=2.39.0")
    assert(a.references.count(r => r.reference_type == "vulnerable_commit" ||
      r.reference_type == "fix_commit") == 3)
    assert(a.date_published.get.toString.startsWith("2030-01-31"))
  }
}

class OpensslPostgresSpec extends AnyFunSuite with SparkTestSession {
  test("openssl secjson: version rows to openssl constraints (S2)") {
    val sp = spark
    import sp.implicits._
    val doc =
      """{"cveMetadata": {"cveId": "CVE-2030-0464"},
        |"containers": {"cna": {
        |  "title": "X.509 policy constraints DoS",
        |  "datePublic": "2030-03-21T00:00:00Z",
        |  "descriptions": [{"lang": "en",
        |    "value": "A security vulnerability has been identified."}],
        |  "metrics": [{"other": {"content": {"text": "Low"}}}],
        |  "references": [
        |    {"name": "OpenSSL Advisory", "url": "https://www.openssl.org/news/secadv/20300321.txt", "tags": ["vendor-advisory"]},
        |    {"name": "3.1.1 commit", "url": "https://github.example/openssl/commit/aa", "tags": ["patch"]}],
        |  "affected": [{"versions": [
        |    {"version": "3.1.0", "lessThan": "3.1.1", "status": "affected"},
        |    {"version": "1.1.1", "lessThanOrEqual": "1.1.1t", "status": "affected"},
        |    {"version": "1.0.2", "status": "affected"},
        |    {"version": "9.9.9", "status": "unaffected"}]}]}}}"""
        .stripMargin.replaceAll("\n", "")
    val rows = OpensslIngest.parse(sp,
      Seq(("openssl", doc)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-0464")
    assert(a.severities.map(_.value) == Seq("Low"))
    val byAff = a.affected.map(p => p.affecting_vers -> p.fixed_vers).toSet
    assert(byAff == Set(
      ("vers:openssl/>=3.1.0|<3.1.1", "vers:openssl/=3.1.1"),
      ("vers:openssl/>=1.1.1|<=1.1.1t", "vers:openssl/"),
      ("vers:openssl/=1.0.2", "vers:openssl/")))
    assert(a.references.exists(r => r.reference_type == "commit" &&
      r.url.endsWith("/commit/aa")))
    assert(a.references.exists(r => r.reference_type == "advisory"))
  }

  test("postgresql security table rows parse (S2)") {
    val sp = spark
    import sp.implicits._
    val html =
      """<html><table><tbody>
        |<tr>
        | <td><span class="nobr">CVE-2030-1552</span><br>
        |     <a href="/support/security/CVE-2030-1552/">more</a></td>
        | <td>12, 13, 14</td>
        | <td>12.9, 13.5, 14.1</td>
        | <td><a href="https://www.first.org/cvss/calculator/v3-calculator?vector=AV:N/AC:H/PR:L/UI:N/S:U/C:H/I:H/A:H&amp;version=3.0">7.1</a></td>
        | <td>Memory disclosure in certain queries on Windows builds</td>
        |</tr>
        |<tr><td>not enough cells</td></tr>
        |</tbody></table></html>""".stripMargin.replaceAll("\n", "")
    val rows = PostgresqlIngest.parse(sp,
      Seq(("postgresql", html)).toDF("datasource_id", "html")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2030-1552")
    assert(a.severities.head.scoring_system == "cvssv3")
    assert(a.severities.head.value == "7.1")
    assert(a.severities.head.scoring_elements.startsWith("CVSS:3.0/AV:N"))
    val ap = a.affected.head
    assert(ap.purl == "pkg:generic/postgresql?os=windows")
    // generic padding (captured postgresql expected): majors pad to x.0.0
    assert(ap.affecting_vers == "vers:generic/=12.0.0|=13.0.0|=14.0.0")
    assert(ap.fixed_vers == "vers:generic/=12.9.0|=13.5.0|=14.1.0")
    assert(a.references.exists(_.url ==
      "https://www.postgresql.org/support/security/CVE-2030-1552/"))
  }
}

class FireeyeMattermostSpec extends AnyFunSuite with SparkTestSession {
  test("fireeye markdown sections parse (S2)") {
    val sp = spark
    import sp.implicits._
    val md =
      """# MNDT-2030-0012
        |
        |Widget Elevation of Privilege
        |
        |## Description
        |
        |The widget service mishandles tokens.
        |
        |## Impact
        |
        |High - Arbitrary Ring 0 code execution
        |
        |## CVE Reference
        |
        |CVE-2030-42712
        |
        |## Common Weakness Enumeration
        |
        |CWE-379: Creation of Temporary File
        |
        |## References
        |
        |- [Mitre CVE](https://www.cve.org/CVERecord?id=CVE-2030-42712)
        |""".stripMargin
    val rows = FireeyeIngest.parse(sp, Seq(
      ("fireeye", "2030/MNDT-2030-0012.md", md),
      ("fireeye", "README.md", md))
      .toDF("datasource_id", "path", "text")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "MNDT-2030-0012")
    assert(a.aliases == Seq("CVE-2030-42712"))
    assert(a.summary.contains("Widget Elevation of Privilege"))
    assert(a.summary.contains("mishandles tokens"))
    assert(a.severities.map(_.value) == Seq("High"))
    assert(a.weaknesses == Seq(379))
    assert(a.references.head.url ==
      "https://www.cve.org/CVERecord?id=CVE-2030-42712")
  }

  test("mattermost feed: id precedence, repo dim, fix pins (S2)") {
    val sp = spark
    import sp.implicits._
    val feed =
      """[{"issue_id": "MMSA-2030-00123, CVE-2030-20222",
        |  "cve_id": "CVE-2030-20222",
        |  "details": "Crafted post crashes the server.",
        |  "platform": "Mattermost Server",
        |  "severity": "High",
        |  "fix_versions": ["v9.5.2", "and 9.4.4", " "]},
        | {"issue_id": "", "cve_id": "garbage", "platform": "Unknown"}]"""
        .stripMargin.replaceAll("\n", "")
    val rows = MattermostIngest.parse(sp,
      Seq(("mattermost", feed)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1) // no valid ids on the second record
    val a = rows.head
    assert(a.advisory_id == "MMSA-2030-00123")
    assert(a.aliases == Seq("CVE-2030-20222", "CVE-2030-20222"))
    assert(a.severities.map(s => (s.scoring_system, s.value)) ==
      Seq(("cvssv3.1_qr", "High")))
    val ap = a.affected.head
    assert(ap.purl == "pkg:github/mattermost/mattermost-server")
    assert(ap.fixed_vers == "vers:semver/=9.5.2|=9.4.4")
  }
}

class ApacheKafkaIngestSpec extends AnyFunSuite with SparkTestSession {
  test("kafka cve-list sections parse ranges and facts (S2)") {
    val sp = spark
    import sp.implicits._
    val html =
      """<div class="td-content">
        |<h2 id="CVE-2030-25194"><a href="https://nvd.example/CVE-2030-25194">RCE via connect</a></h2>
        |<p>A possible security vulnerability was identified in Apache Kafka Connect.</p>
        |<table>
        | <tr><th>Versions affected</th></tr><tr><td><p>2.3.0 to 3.3.1</p></td></tr>
        | <tr><th>Fixed versions</th></tr><tr><td><p>3.4.0, 3.3.2</p></td></tr>
        | <tr><th>Issue announced</th></tr><tr><td><p>2030-02-07</p></td></tr>
        |</table>
        |<h2 id="CVE-2021-44228"><a href="https://x/log4j">log4shell</a></h2>
        |<p>Only affects log4j appender users.</p>
        |<table>
        | <tr><th>Versions affected</th></tr><tr><td><p>all</p></td></tr>
        |</table>
        |</div>""".stripMargin.replaceAll("\n", "")
    val rows = ApacheKafkaIngest.parse(sp,
      Seq(("apache_kafka", html)).toDF("datasource_id", "html"))
      .collect().map(a => a.advisory_id -> a).toMap
    assert(rows.keySet == Set("CVE-2030-25194", "CVE-2021-44228"))
    val a = rows("CVE-2030-25194")
    // summary = build_description(title, first paragraph)
    assert(a.summary ==
      "RCE via connect\nA possible security vulnerability was identified" +
        " in Apache Kafka Connect.")
    val ap = a.affected.head
    assert(ap.purl == "pkg:apache/kafka")
    assert(ap.affecting_vers == "vers:apache/>=2.3.0|<=3.3.1")
    assert(ap.fixed_vers == "vers:apache/=3.4.0|=3.3.2")
    assert(a.date_published.get.toString.startsWith("2030-02-07"))
    // log4j CVEs carry no ranges by the reference's explicit list
    assert(rows("CVE-2021-44228").affected.isEmpty)
  }
}

class TomcatIngestSpec extends AnyFunSuite with SparkTestSession {
  test("tomcat security page: fixed-in sections + affects lines (S2)") {
    val sp = spark
    import sp.implicits._
    val html =
      """<h3 id="Fixed_in_Apache_Tomcat_10.1.35"><span>Fixed in Apache Tomcat 10.1.35</span></h3>
        |<div class="text">
        |<p><strong>Important: RCE via session persistence</strong>
        |   <a href="https://cve.example/CVE-2030-24813">CVE-2030-24813</a></p>
        |<p>Details about partial PUT uploads.</p>
        |<p>Affects: 10.1.0-M1 to 10.1.34</p>
        |<p><strong>Low: info disclosure</strong>
        |   <a href="https://cve.example/CVE-2030-99999">CVE-2030-99999</a></p>
        |<p>Affects: &lt;10.1.20</p>
        |</div>
        |<h3 id="not_a_fix_section">other</h3>""".stripMargin
        .replaceAll("\n", "")
    val rows = TomcatIngest.parse(sp,
      Seq(("apache_tomcat", "https://tomcat.apache.org/security-10.html",
        html)).toDF("datasource_id", "page_url", "html"))
      .collect().map(a => a.advisory_id -> a).toMap
    assert(rows.keySet == Set("security-10/CVE-2030-24813",
      "security-10/CVE-2030-99999"))
    val a = rows("security-10/CVE-2030-24813")
    assert(a.summary == "Important: RCE via session persistence")
    assert(a.affected.map(_.purl).toSet ==
      Set("pkg:apache/tomcat", "pkg:maven/org.apache.tomcat/tomcat"))
    assert(a.affected.head.affecting_vers ==
      "vers:apache/>=10.1.0-M1|<=10.1.34")
    assert(a.affected.head.fixed_vers == "vers:apache/=10.1.35")
    val b = rows("security-10/CVE-2030-99999")
    assert(b.affected.head.affecting_vers == "vers:apache/<10.1.20")
  }
}
