package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._
import graft.operators.SparkTestSession

/** The "complete engine" capstone: one advisory from EVERY parser family
  * in the importer registry flows through the SAME normalized model and
  * one pipeline run — ingest → content-id/latest → alias grouping. A
  * shared CVE proves cross-source set grouping still holds at full
  * breadth. */
class AllSourcesSpec extends AnyFunSuite with SparkTestSession {

  private val SharedCve = "CVE-2031-7777"

  test("every parser family lands in one unified pipeline run") {
    val sp = spark
    import sp.implicits._

    val sources = Seq(
      OsvIngest.parse(sp, Seq(("pypa",
        s"""{"id":"PYSEC-ALL-1","summary":"osv","aliases":["$SharedCve"],
           |"modified":"2031-01-01T00:00:00Z","affected":[]}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      NvdIngest.parse(sp, Seq(("nvd",
        s"""{"cve":{"id":"$SharedCve","published":"2031-01-02T00:00:00.000",
           |"lastModified":"2031-01-02T00:00:00.000",
           |"descriptions":[{"lang":"en","value":"nvd"}],
           |"metrics":{},"references":[]}}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      GitlabIngest.parse(sp, Seq(("gitlab", "pypi/x/CVE.yml",
        s"""---
           |identifier: "$SharedCve"
           |package_slug: "pypi/x"
           |title: "t"
           |description: "d"
           |pubdate: "2031-01-03"
           |affected_range: "<1.0"
           |fixed_versions:
           |- "1.0"
           |identifiers:
           |- "$SharedCve"
           |""".stripMargin)).toDF("datasource_id", "path", "yaml")).toDF(),
      RedhatIngest.parse(sp, Seq(("redhat",
        s"""{"document":{"csaf_version":"2.0",
           |"notes":[{"category":"summary","text":"rh"}],"references":[],
           |"tracking":{"id":"RHSA-2031:1",
           |"initial_release_date":"2031-01-04T00:00:00+00:00"}},
           |"vulnerabilities":[{"cve":"$SharedCve"}],
           |"product_tree":{"branches":[]}}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      AlpineIngest.parse(sp, Seq(("alpine_linux",
        s"""{"archs":["x86_64"],"reponame":"main","distroversion":"v3.20",
           |"packages":[{"pkg":{"name":"pkgx","secfixes":{"1.0-r0":
           |["$SharedCve"]}}}]}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      NginxIngest.parse(sp, Seq(("nginx",
        s"""<li><p>bug<br>Severity: low<br>
           |<a href="https://x/CVE">$SharedCve</a><br>
           |Not vulnerable: 1.2.3+<br>Vulnerable: 1.0.0-1.2.2</p></li>"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "html"))
        .toDF(),
      VulnrichmentIngest.parse(sp, Seq(("vulnrichment",
        s"""{"cveMetadata":{"cveId":"$SharedCve","state":"PUBLISHED",
           |"datePublished":"2031-01-05T00:00:00.000Z"},
           |"containers":{"cna":{"descriptions":[
           |{"lang":"en","value":"vr"}]}}}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      SuseScoreIngest.parse(sp, Seq(("suse_score",
        s"""---
           |$SharedCve:
           |  cvss:
           |    - version: 3.1
           |      score: 5.5
           |      vector: CVSS:3.1/AV:L/AC:L/PR:N/UI:R/S:U/C:N/I:N/A:H
           |""".stripMargin)).toDF("datasource_id", "yaml")).toDF(),
      CurlIngest.parse(sp, Seq(("curl",
        s"""{"id":"CURL-$SharedCve","aliases":["$SharedCve"],
           |"summary":"c","published":"2031-01-06T00:00:00.00Z",
           |"affected":[{"versions":["8.0.0"],"ranges":[]}],
           |"database_specific":{"severity":"Low"}}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      ArchIngest.parse(sp, Seq(("archlinux",
        s"""[{"name":"AVG-ALL-1","packages":["pkgy"],"severity":"High",
           |"type":"dos","affected":"1.0-1","fixed":"1.1-1",
           |"issues":["$SharedCve"],"advisories":[]}]"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      ApacheHttpdIngest.parse(sp, Seq(("apache_httpd",
        s"""{"CVE_data_meta":{"ID":"$SharedCve"},
           |"description":{"description_data":[
           |{"lang":"eng","value":"httpd"}]},
           |"impact":[{"other":"low"}],
           |"timeline":[{"time":"2031-01-07","value":"public"}]}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      XenIngest.parse(sp, Seq(("xen",
        s"""[{"xsas":[{"xsa":"900","title":"x",
           |"public_time":"2031-01-08T00:00:00Z",
           |"cve":["$SharedCve"]}]}]"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      RetireDotnetIngest.parse(sp, Seq(("retiredotnet",
        "Content/2031-01.json",
        s"""{"description":"see $SharedCve","link":"https://x/a",
           |"packages":[{"id":"P.Q","fix":"2.0"}]}"""
          .stripMargin.replaceAll("\n", "")))
        .toDF("datasource_id", "path", "json")).toDF(),
      NodeSecurityIngest.parse(sp, Seq(("npm",
        s"""{"id":"991","title":"n","created_at":"2031-01-09T00:00:00.000Z",
           |"module_name":"widget","vulnerable_versions":"<1.0.0",
           |"patched_versions":">=1.0.0","cves":["$SharedCve"]}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      MozillaIngest.parse(sp, Seq(("mozilla", "announce/mfsa2031-01.yml",
        s"""announced: January 9, 2031
           |impact: High
           |fixed_in:
           |  - Firefox 199
           |description: m
           |advisories:
           |  $SharedCve:
           |    impact: high
           |    description: d
           |""".stripMargin)).toDF("datasource_id", "path", "text")).toDF(),
      RubyIngest.parse(sp, Seq(("ruby_advisory_db",
        "gems/g/CVE-2031-7777.yml",
        s"""---
           |gem: g
           |cve: "2031-7777"
           |patched_versions:
           |  - ">= 2.0"
           |""".stripMargin)).toDF("datasource_id", "path", "yaml")).toDF(),
      ElixirIngest.parse(sp, Seq(("elixir_security",
        "packages/ex/2031-7777.yml",
        s"""---
           |package: ex
           |cve: "2031-7777"
           |patched_versions:
           |  - ">= 1.1.0"
           |""".stripMargin)).toDF("datasource_id", "path", "yaml")).toDF(),
      IstioIngest.parse(sp, Seq(("istio",
        "content/en/news/security/ISTIO-SECURITY-2031-01/index.md",
        s"""---
           |title: ISTIO-SECURITY-2031-01
           |description: i
           |cves: [$SharedCve]
           |publishdate: 2031-01-10
           |releases: ["1.20.0"]
           |---
           |body""".stripMargin)).toDF("datasource_id", "path", "text"))
        .toDF(),
      GentooIngest.parse(sp, Seq(("gentoo",
        s"""<glsa id="203101-01"><synopsis>s</synopsis>
           |<references><uri>$SharedCve</uri></references></glsa>"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "xml"))
        .toDF(),
      GlibcIngest.parse(sp, Seq(("glibc",
        "advisories/GLIBC-SA-2031-0001",
        s"""t
           |
           |d
           |
           |CVE-Id: $SharedCve
           |Fix-Commit: aaaa1111bbbb2222cccc (2.40)
           |""".stripMargin)).toDF("datasource_id", "path", "text")).toDF(),
      OpensslIngest.parse(sp, Seq(("openssl",
        s"""{"cveMetadata":{"cveId":"$SharedCve"},
           |"containers":{"cna":{"title":"o",
           |"datePublic":"2031-01-11T00:00:00Z",
           |"descriptions":[{"lang":"en","value":"o"}]}}}"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      PostgresqlIngest.parse(sp, Seq(("postgresql",
        s"""<table><tbody><tr><td>$SharedCve</td><td>15</td>
           |<td>15.1</td><td>n/a</td><td>pg bug</td></tr></tbody></table>"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "html"))
        .toDF(),
      FireeyeIngest.parse(sp, Seq(("fireeye", "2031/MNDT-2031-01.md",
        s"""# MNDT-2031-01
           |t
           |## CVE Reference
           |$SharedCve
           |""".stripMargin)).toDF("datasource_id", "path", "text")).toDF(),
      MattermostIngest.parse(sp, Seq(("mattermost",
        s"""[{"issue_id":"MMSA-2031-001","cve_id":"$SharedCve",
           |"details":"mm","platform":"Mattermost Server","severity":"Low",
           |"fix_versions":["v10.0.1"]}]"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "json"))
        .toDF(),
      ApacheKafkaIngest.parse(sp, Seq(("apache_kafka",
        s"""<h2 id="$SharedCve"><a href="https://x">k</a></h2><p>kafka</p>
           |<table><tr><th>Versions affected</th></tr>
           |<tr><td><p>3.0.0 to 3.5.0</p></td></tr></table>"""
          .stripMargin.replaceAll("\n", ""))).toDF("datasource_id", "html"))
        .toDF(),
      TomcatIngest.parse(sp, Seq(("apache_tomcat",
        "https://tomcat.apache.org/security-11.html",
        s"""<h3 id="Fixed_in_Apache_Tomcat_11.0.1"><span>Fixed in Apache
           | Tomcat 11.0.1</span></h3><div class="text">
           |<p><strong>Low: x</strong>
           |<a href="https://cve.example/$SharedCve">$SharedCve</a></p>
           |<p>Affects: 11.0.0</p></div>"""
          .stripMargin.replaceAll("\n", "")))
        .toDF("datasource_id", "page_url", "html")).toDF(),
      FixCommitsIngest.fromCommits(sp,
        Seq(("ff00aa11", s"fix $SharedCve overflow")).toDF(
          "commit_hash", "message"),
        "https://github.com/torvalds/linux", "linux_fix_commits").toDF(),
      FixCommitDatasetsIngest.aosp(sp, Seq(("aosp", "cves/x.json",
        s"""{"cveId":"$SharedCve","vulnerabilityType":"EoP",
           |"severity":"High","dateReported":"2031-01-12","fixes":[]}"""
          .stripMargin.replaceAll("\n", "")))
        .toDF("datasource_id", "path", "json")).toDF())

    val all = sources.reduce(_ unionByName _)
    val advisories = graft.derive.AdvisoryDerive
      .withContentIdAndLatest(all).cache()
    val datasources = advisories.select("datasource_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(datasources.size == sources.size,
      s"expected ${sources.size} datasources, got ${datasources.size}: " +
        datasources.toSeq.sorted.mkString(","))

    // every source's view of the shared CVE groups into ONE advisory set
    // (set keys are aliases AND advisory ids, so views that carry the CVE
    // as their id — nvd, fix-commits, postgresql — join too)
    val sets = graft.derive.AdvisoryDerive.advisorySets(sp, advisories)
      .cache()
    val nvdGroup = sets.filter(col("avid") === s"nvd/$SharedCve")
      .select("group_id")
    val members = sets.join(broadcast(nvdGroup), Seq("group_id"))
    // every source whose advisory carries the shared CVE (as id or alias)
    // must be in that one group
    val carriers = advisories.filter(col("is_latest"))
      .filter(array_contains(col("aliases"), SharedCve) ||
        col("advisory_id").contains(SharedCve))
      .select("avid").distinct().count()
    assert(members.count() == carriers,
      s"${members.count()} grouped of $carriers shared-CVE views")
    assert(carriers >= sources.size - 4,
      s"only $carriers of ${sources.size} sources carry the shared CVE")
  }
}
