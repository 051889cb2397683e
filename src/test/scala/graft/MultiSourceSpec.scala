package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._
import graft.operators.SparkTestSession

/** Capstone: every source parser (OSV, NVD, GitHub GraphQL, Debian
  * tracker, AdvisoryData JSON, GitLab YAML, RedHat CSAF) feeds the SAME
  * normalized model and flows through one Engine.runAdvisoryPipeline
  * call — the reference's ~70 importers reduce to raw→AdvisoryRow
  * mappings over a shared pipeline.
  */
class MultiSourceSpec extends AnyFunSuite with SparkTestSession {

  test("seven source formats unify through one pipeline run") {
    val sp = spark
    import sp.implicits._

    val osv = OsvIngest.parse(sp, Seq(("osv",
      """{"id":"OSV-1","summary":"osv bug","aliases":["CVE-2030-1"],
        |"modified":"2024-01-01T00:00:00Z",
        |"affected":[{"package":{"ecosystem":"npm","name":"left","purl":"pkg:npm/left"},
        |"ranges":[{"type":"SEMVER","events":[{"introduced":"0"},{"fixed":"2.0.0"}]}]}]}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))

    val nvd = NvdIngest.parse(sp, Seq(("nvd",
      """{"cve":{"id":"CVE-2030-1","published":"2024-01-02T00:00:00.000",
        |"lastModified":"2024-01-03T00:00:00.000",
        |"descriptions":[{"lang":"en","value":"nvd view of the bug"}],
        |"metrics":{"cvssMetricV31":[{"cvssData":{"baseScore":9.1,
        |"vectorString":"CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:N"}}]},
        |"references":[{"url":"https://x/1","tags":["Vendor Advisory"]}]}}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))

    val gh = GithubIngest.parse(sp, Seq(("github",
      """{"data":{"securityAdvisories":{"nodes":[{"ghsaId":"GHSA-m-1",
        |"summary":"gh view","publishedAt":"2024-01-04T00:00:00Z",
        |"updatedAt":"2024-01-04T00:00:00Z","permalink":"https://g/1",
        |"identifiers":[{"type":"CVE","value":"CVE-2030-1"}],
        |"cvss":{"score":9.0,"vectorString":null},
        |"references":[],
        |"vulnerabilities":{"nodes":[{"package":{"ecosystem":"NPM","name":"left"},
        |"vulnerableVersionRange":"< 2.0.0",
        |"firstPatchedVersion":{"identifier":"2.0.0"}}]}}]}}}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))

    val deb = DebianTrackerIngest.parse(sp, Seq(("debian",
      """{"node-left":{"CVE-2030-1":{"description":"deb view","scope":"remote",
        |"releases":{"sid":{"status":"resolved","fixed_version":"2.0.0-1",
        |"urgency":"high"}}}}}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"),
      collectedAt = "2024-01-05")

    val fixture = AdvisoryJsonIngest.parse(sp, Seq(("pypa",
      """{"advisory_id":"PYSEC-X","aliases":["CVE-2030-2"],"summary":"other",
        |"affected_packages":[{"package":{"type":"pypi","namespace":"","name":"p",
        |"version":"","qualifiers":"","subpath":""},
        |"affected_version_range":"vers:pypi/<1.0",
        |"fixed_version_range":"vers:pypi/1.0","fixed_by_commit_patches":[]}],
        |"references":[],"severities":[],
        |"date_published":"2024-01-06T00:00:00+00:00","weaknesses":[],
        |"url":"https://p/x"}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))

    val gitlab = GitlabIngest.parse(sp, Seq(("gitlab",
      "npm/left/CVE-2030-1.yml",
      """---
        |identifier: "CVE-2030-1"
        |package_slug: "npm/left"
        |title: "gitlab view"
        |description: "left is vulnerable."
        |pubdate: "2024-01-07"
        |affected_range: "<2.0.0"
        |fixed_versions:
        |- "2.0.0"
        |urls:
        |- "https://nvd.nist.gov/vuln/detail/CVE-2030-1"
        |identifiers:
        |- "CVE-2030-1"
        |""".stripMargin)).toDF("datasource_id", "path", "yaml"))

    val redhat = RedhatIngest.parse(sp, Seq(("redhat",
      """{"document":{"csaf_version":"2.0",
        |"aggregate_severity":{"text":"Moderate"},
        |"notes":[{"category":"summary","text":"redhat view"}],
        |"references":[],
        |"tracking":{"id":"RHSA-2030:0101",
        |"initial_release_date":"2024-01-08T00:00:00+00:00"}},
        |"vulnerabilities":[{"cve":"CVE-2030-1"}],
        |"product_tree":{"branches":[{"branches":[
        |{"category":"architecture","branches":[
        |{"product":{"product_identification_helper":
        |{"purl":"pkg:rpm/redhat/nodejs-left@2.0.0-1.el9"}}}]}]}]}}"""
        .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))

    val raw = Seq(osv.toDF(), nvd.toDF(), gh.toDF(), deb.toDF(),
      fixture.toDF(), gitlab.toDF(), redhat.toDF())
      .reduce(_ unionByName _)
    val versionsDim = Seq(
      ("pkg:npm/left", "1.0.0"), ("pkg:npm/left", "2.0.0"),
      ("pkg:deb/debian/node-left", "1.9-1"),
      ("pkg:deb/debian/node-left", "2.0.0-1"),
      ("pkg:pypi/p", "0.9"), ("pkg:pypi/p", "1.0")).toDF("base_purl", "version")

    val marts = Engine.runAdvisoryPipeline(sp, raw, versionsDim)

    // all seven sources landed
    assert(marts.advisories.select("datasource_id").distinct().count() == 7)
    // the six CVE-2030-1 views group into ONE advisory set; RedHat
    // (precedence 200, closest to source) is the primary
    val sets = marts.advisorySets.collect()
      .map(r => r.getAs[String]("avid") -> r.getAs[String]("primary_avid"))
      .toMap
    val cve1Members = Seq("osv/OSV-1", "nvd/CVE-2030-1", "github/GHSA-m-1",
      "debian/CVE-2030-1/node-left", "gitlab/npm/left/CVE-2030-1",
      "redhat/RHSA-2030:0101")
    assert(cve1Members.map(sets).toSet.size == 1)
    assert(sets("osv/OSV-1") == "redhat/RHSA-2030:0101")
    assert(sets("pypa/PYSEC-X") != sets("osv/OSV-1"))
    // unfurl agrees across formats: npm/left 1.0.0 affected, 2.0.0 fixed
    // (osv + gh + gitlab all resolve the same concrete versions)
    val leftRows = marts.unfurled
      .filter(col("base_purl") === "pkg:npm/left").collect()
      .map(r => (r.getAs[String]("avid"), r.getAs[String]("version"),
        r.getAs[Boolean]("is_affected"), r.getAs[Boolean]("is_fixed")))
    assert(leftRows.count(t => t._2 == "1.0.0" && t._3) == 3)
    assert(leftRows.count(t => t._2 == "2.0.0" && t._4) == 3)
  }
}
