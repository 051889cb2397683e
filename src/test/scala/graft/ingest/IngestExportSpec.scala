package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.derive.AdvisoryDerive
import graft.export.FederatedExport
import graft.functions.{Ssvc, TextUtil}
import graft.operators.SparkTestSession

class OvalIngestSpec extends AnyFunSuite with SparkTestSession {
  private val ovalXml =
    """<?xml version="1.0"?>
      |<oval_definitions xmlns="http://oval.mitre.org/XMLSchema/oval-definitions-5">
      |<definitions>
      |  <definition id="oval:org.debian:def:1" class="vulnerability">
      |    <metadata>
      |      <title>CVE-2024-1 curl</title>
      |      <reference source="CVE" ref_id="CVE-2024-1"/>
      |      <advisory><severity>high</severity></advisory>
      |    </metadata>
      |    <criteria>
      |      <criterion test_ref="t1" comment="curl is earlier than 7.88.1-1"/>
      |    </criteria>
      |  </definition>
      |</definitions>
      |</oval_definitions>""".stripMargin

  test("OVAL definitions parse to flat rows (S3)") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(("debian_oval", ovalXml)).toDF("datasource_id", "xml")
    val defs = OvalIngest.parse(sp, raw).collect()
    assert(defs.length == 1)
    val d = defs.head
    assert(d.definition_id == "oval:org.debian:def:1")
    assert(d.cves == Seq("CVE-2024-1"))
    assert(d.severity == "high")
    assert(d.fixed_versions == Seq("7.88.1-1"))
  }

  test("a CVE that is both a reference and a <cve> element dedups") {
    val sp = spark
    import sp.implicits._
    val xml =
      """<?xml version="1.0"?>
        |<oval_definitions xmlns="http://oval.mitre.org/XMLSchema/oval-definitions-5">
        |<definitions>
        |  <definition id="oval:x:def:2" class="vulnerability">
        |    <metadata>
        |      <title>dup cve</title>
        |      <reference source="CVE" ref_id="CVE-2024-7"/>
        |      <advisory><severity>low</severity>
        |        <cve impact="low">CVE-2024-7</cve></advisory>
        |    </metadata>
        |  </definition>
        |</definitions>
        |</oval_definitions>""".stripMargin
    val raw = Seq(("suse_oval", xml)).toDF("datasource_id", "xml")
    val d = OvalIngest.parse(sp, raw).collect().head
    assert(d.cves == Seq("CVE-2024-7"))
  }

  test("DTDs are rejected (no XXE)") {
    val sp = spark
    import sp.implicits._
    val evil = """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]><x>&e;</x>"""
    val raw = Seq(("s", evil)).toDF("datasource_id", "xml")
    intercept[org.apache.spark.SparkException] {
      OvalIngest.parse(sp, raw).collect()
    }
  }
}

class TabularIngestSpec extends AnyFunSuite with SparkTestSession {
  test("KEV csv parse + enrichment join (S2/J10)") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("kev").toFile
    val csv = new java.io.File(dir, "kev.csv")
    Files.writeString(csv.toPath,
      """cveID,vendorProject,product,shortDescription,knownRansomwareCampaignUse,dateAdded
        |CVE-2024-100,acme,thing,Bad bug,Known,2024-02-01
        |CVE-2024-999,acme,other,Other bug,Unknown,2024-02-02
        |""".stripMargin)
    val kev = TabularIngest.kevFromCsv(sp, csv.getAbsolutePath)
    assert(kev.count() == 2)
    val aliasLinks = Seq(("pypa/PYSEC-1", "CVE-2024-100"))
      .toDF("avid", "alias")
    val enriched = TabularIngest.enrichWithExploits(aliasLinks, kev).collect()
    assert(enriched.length == 1)
    assert(enriched.head.getAs[Boolean]("known_ransomware_campaign_use"))
  }
}

class FederatedExportSpec extends AnyFunSuite with SparkTestSession {

  private def fullAdvisories(sp: org.apache.spark.sql.SparkSession) = {
    import sp.implicits._
    Seq(
      ("pypa", "P-1", "pypa/P-1", "SQLi fix\r\nsecond\tline",
        Seq("GHSA-1", "CVE-1"), "https://u/1", true,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        Seq(("cvssv3.1", "9.8", "CVSS:3.1/AV:N", "https://nvd.example/1")),
        Seq(("https://x/poc", "exploit", "EDB-1")),
        Seq(89, 79),
        Seq(("pkg:pypi/foo", "vers:pypi/>=1.0|<2.0", "vers:pypi/2.0"),
          ("pkg:pypi/bar", "vers:pypi/<0.5", ""))),
      ("pypa", "P-2", "pypa/P-2", "XSS", Seq("CVE-2"), "https://u/2", true,
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
        Seq.empty, Seq.empty, Seq.empty, Seq.empty),
      ("pypa", "P-2", "pypa/P-2", "old", Seq("CVE-2"), "https://u/2", false,
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        Seq.empty, Seq.empty, Seq.empty, Seq.empty))
      .toDF("datasource_id", "advisory_id", "avid", "summary", "aliases",
        "url", "is_latest", "date_collected", "sevs", "refs", "weaknesses",
        "affs")
      .withColumn("severities", expr(
        "transform(sevs, x -> named_struct('scoring_system', x._1, " +
          "'value', x._2, 'scoring_elements', x._3, 'url', x._4))"))
      .withColumn("references", expr(
        "transform(refs, x -> named_struct('url', x._1, " +
          "'reference_type', x._2, 'reference_id', x._3))"))
      .withColumn("affected", expr(
        "transform(affs, x -> named_struct('purl', x._1, " +
          "'affecting_vers', x._2, 'fixed_vers', x._3))"))
      .drop("sevs", "refs", "affs")
  }

  test("full serialize_advisory schema: aliases, impacts with commits, " +
      "severities, weaknesses, references (S7)") {
    val sp = spark
    import sp.implicits._
    val patches = Seq(
      ("pypa/P-1", "pkg:pypi/foo", "https://g/r", "abc123", "fixed"),
      ("pypa/P-1", "pkg:pypi/foo", "https://g/r", "def456", "introduced"))
      .toDF("avid", "purl", "vcs_url", "commit_hash", "kind")
    val serialized =
      FederatedExport.serialize(fullAdvisories(sp), Some(patches))
    assert(serialized.count() == 2) // latest only
    val y = serialized.filter(col("path").contains("pypa_P-1"))
      .select("yaml").collect().head.getString(0)
    // reference-shaped document (export.py:137-170): every top-level key
    assert(y ==
      """advisory_id: "P-1"
        |datasource_id: "pypa/P-1"
        |datasource_url: "https://u/1"
        |aliases:
        |  - "CVE-1"
        |  - "GHSA-1"
        |summary: "SQLi fix\r\nsecond\tline"
        |impacted_packages:
        |  - purl: "pkg:pypi/bar"
        |    affected_versions: "vers:pypi/<0.5"
        |    fixed_versions: ""
        |    fixed_in_commits: []
        |    introduced_in_commits: []
        |  - purl: "pkg:pypi/foo"
        |    affected_versions: "vers:pypi/>=1.0|<2.0"
        |    fixed_versions: "vers:pypi/2.0"
        |    fixed_in_commits:
        |      - vcs_url: "https://g/r"
        |        commit: "abc123"
        |    introduced_in_commits:
        |      - vcs_url: "https://g/r"
        |        commit: "def456"
        |severities:
        |  - score: "9.8"
        |    scoring_system: "cvssv3.1"
        |    scoring_elements: "CVSS:3.1/AV:N"
        |    published_at: null
        |    url: "https://nvd.example/1"
        |weaknesses:
        |  - CWE-89
        |  - CWE-79
        |references:
        |  - url: "https://x/poc"
        |    reference_type: "exploit"
        |    reference_id: "EDB-1"
        |""".stripMargin)
    // empty-collection advisory renders inline empties
    val y2 = serialized.filter(col("path").contains("pypa_P-2"))
      .select("yaml").collect().head.getString(0)
    assert(y2.contains("impacted_packages: []"))
    assert(y2.contains("severities: []"))
    assert(y2.contains("weaknesses: []"))
    assert(y2.contains("references: []"))
    // structural columns for the driver oracle
    val s1 = serialized.filter(col("advisory_id") === "P-1").collect().head
    assert(s1.getAs[Int]("n_impacts") == 2 &&
      s1.getAs[Int]("n_severities") == 1 &&
      s1.getAs[Int]("n_references") == 1 &&
      s1.getAs[Int]("n_weaknesses") == 2)
  }

  test("package index, watermark, filesystem write (S7/T2)") {
    val sp = spark
    import sp.implicits._
    val advisories = fullAdvisories(sp)
    // incremental: checkpoint after Jan → only P-2 exports
    val inc = FederatedExport.changedSince(advisories,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(FederatedExport.serialize(inc).count() == 1)
    // per-package index (export.py:79-96)
    val unfurled = Seq(
      ("pypa/P-1", "pkg:pypi/foo", "1.0.0", true, false),
      ("pypa/P-2", "pkg:pypi/foo", "1.0.0", true, false),
      ("pypa/P-1", "pkg:pypi/foo", "2.0", false, true))
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val idx = FederatedExport.packageIndex(unfurled)
    val rows = idx.collect().map(r => r.getAs[String]("purl") ->
      r.getAs[String]("yaml")).toMap
    assert(rows.keySet ==
      Set("pkg:pypi/foo@1.0.0", "pkg:pypi/foo@2.0"))
    assert(rows("pkg:pypi/foo@1.0.0") ==
      """- purl: "pkg:pypi/foo@1.0.0"
        |  affected_by_advisories:
        |    - "pypa/P-1"
        |    - "pypa/P-2"
        |  fixing_advisories: []
        |""".stripMargin)
    assert(rows("pkg:pypi/foo@2.0").contains(
      "fixing_advisories:\n    - \"pypa/P-1\""))
    // filesystem shape: shard=XX directories
    val out = Files.createTempDirectory("fedexport").toString
    FederatedExport.write(FederatedExport.serialize(advisories), out)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
  }
}

class SsvcTextUtilSpec extends AnyFunSuite {
  test("SSVC decision table + vector (F13)") {
    assert(Ssvc.decision("active", "yes", "total", "high") == "Act")
    assert(Ssvc.decision("none", "no", "partial", "low") == "Track")
    assert(Ssvc.decision("poc", "no", "total", "high") == "Attend")
    assert(Ssvc.vector("active", "yes", "total", "high")
      == "SSVCv2/E:A/A:Y/T:T/M:H/D:C/")
  }

  test("front-matter split (F19)") {
    val (fm, body) = TextUtil.splitFrontMatter("---\ntitle: x\n---\nbody text")
    assert(fm == "title: x")
    assert(body == "body text")
    assert(TextUtil.splitFrontMatter("no front matter") == ("", "no front matter"))
  }

  test("purl_to_dict with empty defaults (F4)") {
    val d = TextUtil.purlToDict("pkg:npm/lodash@4.17.21")
    assert(d("type") == "npm" && d("namespace") == "" && d("version") == "4.17.21")
  }

  test("vcs url normalization + commit check (F21)") {
    // the reference's normalize_vcs_url doctests + test_collect_commits
    // assertions: scheme'd URLs come back VERBATIM, git@ rewrites per
    // hoster, shortcuts expand, bare user/repo is implicit github
    assert(TextUtil.normalizeVcsUrl("github:user/repo") == "https://github.com/user/repo")
    assert(TextUtil.normalizeVcsUrl("git+https://github.com/a/b.git")
      == "git+https://github.com/a/b.git")
    assert(TextUtil.normalizeVcsUrl("git@github.com:user/repo.git")
      == "https://github.com/user/repo.git")
    assert(TextUtil.normalizeVcsUrl("git@example.org:user/repo.git")
      == "git://example.org/user/repo.git")
    assert(TextUtil.normalizeVcsUrl("git@github.com/Filirom1/npm2aur.git")
      == "https://github.com/Filirom1/npm2aur.git")
    assert(TextUtil.normalizeVcsUrl("expressjs/serve-static")
      == "https://github.com/expressjs/serve-static")
    assert(TextUtil.normalizeVcsUrl("gist:11081aaa281")
      == "https://gist.github.com/11081aaa281")
    assert(TextUtil.normalizeVcsUrl("git://github.com/hapijs/boom")
      == "git://github.com/hapijs/boom")
    assert(TextUtil.isCommit("deadbeefcafe1234"))
    assert(!TextUtil.isCommit("not-a-commit"))
  }

  test("patch source classification (F22)") {
    assert(TextUtil.classifyPatchSource(
      "https://github.com/a/b/commit/deadbeefcafe1234") == "commit_patch")
    assert(TextUtil.classifyPatchSource("https://x/fix.patch") == "patch")
    assert(TextUtil.classifyPatchSource("https://x/advisory") == "reference")
  }
}
