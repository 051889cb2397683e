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
  test("YAML serialization, sharding, watermark, filesystem write (S7/T2)") {
    val sp = spark
    import sp.implicits._
    val advisories = Seq(
      ("pypa/P-1", "SQLi", Seq("CVE-1", "GHSA-1"), "https://u/1", true,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(4.9)),
      ("pypa/P-2", "XSS", Seq("CVE-2"), "https://u/2", true,
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), None),
      ("pypa/P-2", "old", Seq("CVE-2"), "https://u/2", false,
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), None))
      .toDF("avid", "summary", "aliases", "url", "is_latest",
        "date_collected", "risk_score")
    val serialized = FederatedExport.serialize(advisories)
    assert(serialized.count() == 2) // latest only
    val y = serialized.filter(col("path").contains("pypa_P-1"))
      .select("yaml").collect().head.getString(0)
    assert(y.contains("advisory_id: \"pypa/P-1\""))
    assert(y.contains("  - CVE-1\n  - GHSA-1"))
    assert(y.contains("risk_score: 4.9"))
    // incremental: checkpoint after Jan → only P-2 exports
    val inc = FederatedExport.changedSince(advisories,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(FederatedExport.serialize(inc).count() == 1)
    // filesystem shape: shard=XX directories
    val out = Files.createTempDirectory("fedexport").toString
    FederatedExport.write(serialized, out)
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
    assert(TextUtil.normalizeVcsUrl("github:user/repo") == "https://github.com/user/repo")
    assert(TextUtil.normalizeVcsUrl("git+https://github.com/a/b.git")
      == "https://github.com/a/b")
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
