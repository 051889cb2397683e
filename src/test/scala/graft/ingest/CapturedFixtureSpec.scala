package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Parser fidelity vs the reference's CAPTURED upstream payloads
  * (`vulnerabilities/tests/test_data/…` — snapshots of the real feeds,
  * each with the reference pipeline's expected output JSON). Every test
  * routes a captured payload through the matching `*Ingest` parser
  * and canonical-compares (RefCapture.Canon) against the captured
  * `*-expected.json`. Skipped wholesale when the reference checkout is
  * not present (GRAFT_REF_TESTDATA overrides the default path).
  *
  * 32 fixture sets are cross-validated here (every ACTIVE reference
  * pipeline with a capture). Deliberately NOT covered: v1-only captures
  * whose parser family already validates against a newer v2 capture
  * (github_osv/pysec/pypa/oss_fuzz v1 — the shared OSV parser is
  * covered by the 15 osv_test v2 files; fireeye/gentoo/ruby/nvd/suse v1
  * — superseded by their _v2 sets), captures of v1 OVAL variants
  * (debian tracker v1, debian-oval/ubuntu-oval/suse_oval — no OVAL
  * importer is in the reference's active registry), and improver
  * fixtures (the improver derivations are covered by the d/j-query
  * oracles). The reference-abandoned v1 importers (gsd, ubuntu_usn_db,
  * rust, suse_backports, kaybee) are covered separately by
  * LegacyImportersSpec against the same captured test_data.
  */
class CapturedFixtureSpec extends AnyFunSuite with SparkTestSession {

  private def withRef(name: String)(body: => Unit): Unit =
    test(name) {
      assume(RefCapture.available, "reference test_data checkout not present")
      body
    }

  // ---------------------------------------------------------------- nginx
  withRef("nginx: captured security_advisories.html matches v2 expected") {
    val sp = spark
    import sp.implicits._
    val html = RefCapture.text("nginx_v2/security_advisories.html")
    val rows = NginxIngest.parse(sp,
      Seq(("nginx", html)).toDF("datasource_id", "html")).collect().toSeq
    val want = RefCapture.loadExpected(
      "nginx_v2/security_advisories-advisory_data-expected.json")
    // severities skipped: the reference v2 pipeline structurally drops
    // them (bs4 sees the bare `Severity: ` text node, nginx_importer.py
    // :203-206, and AdvisoryDataV2 is built without severities at :146) —
    // we keep the page's `Severity: <b>major</b>` value as generic_textual,
    // matching the v1 importer's captured behavior
    RefCapture.assertMatch("nginx", rows.map(RefCapture.canonRow), want,
      skip = Set("severities"))
    assert(want.count(_.severities.nonEmpty) == 0) // ref v2 really drops them
    assert(rows.count(_.severities.nonEmpty) > 20) // we really keep them
  }

  // ---------------------------------------------------------------- glibc
  withRef("glibc: captured GLIBC-SA advisories match v2 expected") {
    for (sa <- Seq("GLIBC-SA-2023-0001", "GLIBC-SA-2025-0004",
        "GLIBC-SA-2026-0002")) {
      val rows = GlibcIngest.parseOne("glibc", sa,
        RefCapture.text(s"glibc/advisories/$sa")).toSeq
      val want = RefCapture.loadExpected(s"glibc/advisories/$sa-expected.json")
      RefCapture.assertMatch(s"glibc/$sa", rows.map(RefCapture.canonRow), want)
    }
  }

  // -------------------------------------------------------------- fireeye
  withRef("fireeye: captured Mandiant disclosures match v2 expected") {
    for (id <- Seq("FEYE-2019-0002", "FEYE-2020-0020", "MNDT-2025-0009")) {
      val rows = FireeyeIngest.parseOne("fireeye", s"$id.md",
        RefCapture.text(s"fireeye_v2/$id.md")).toSeq
      val want = RefCapture.loadExpected(s"fireeye_v2/$id-expected.json")
      RefCapture.assertMatch(s"fireeye/$id",
        rows.map(RefCapture.canonRow), want)
    }
  }

  // ----------------------------------------------------------------- ruby
  withRef("ruby: captured rubysec advisories match v2 expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    for (rel <- Seq("gems/CVE-2020-5257", "gems/CVE-2024-6531",
        "rubies/CVE-2011-2686", "rubies/CVE-2022-25857")) {
      val rows = RubyIngest.parseOne(yaml, "ruby", s"$rel.yml",
        RefCapture.text(s"ruby-v2/$rel.yml")).toSeq
      val want = RefCapture.loadExpected(s"ruby-v2/$rel-expected.json")
      RefCapture.assertMatch(s"ruby/$rel", rows.map(RefCapture.canonRow), want)
    }
  }

  // ----------------------------------------------------------- suse score
  withRef("suse scores: captured cvss yaml matches v2 expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val rows = SuseScoreIngest.parseOne(yaml, "suse_scores",
      RefCapture.text("suse_scores_v2/suse-cvss-scores.yaml"))
    val want = RefCapture.loadExpected(
      "suse_scores_v2/suse-cvss-scores-expected.json")
    RefCapture.assertMatch("suse_scores", rows.map(RefCapture.canonRow), want)
  }

  // ---------------------------------------------------------- retiredotnet
  withRef("retiredotnet: captured advisory matches v2 expected") {
    val sp = spark
    import sp.implicits._
    val rows = RetireDotnetIngest.parse(sp,
      Seq(("retiredotnet", "Content/12.json",
        RefCapture.text("retiredotnet_v2/12.json")))
        .toDF("datasource_id", "path", "json")).collect().toSeq
    val want = RefCapture.loadExpected("retiredotnet_v2/expected_file.json")
    RefCapture.assertMatch("retiredotnet",
      rows.map(RefCapture.canonRow), want)
  }

  // ----------------------------------------------------------------- epss
  withRef("epss: captured scores csv matches v2 expected") {
    val sp = spark
    val csv = RefCapture.root.resolve("epss/epss_scores-2025-x-x.csv")
    val donors = EpssIngest.donors(
      EpssIngest.fromCsv(sp, csv.toString)).collect()
    val want = RefCapture.loadExpected("epss/epss-expected.json")
    // donors is the engine's severity-feed shape, not AdvisoryRow —
    // project both sides to (cve, score, percentile, reference url);
    // scores compare numerically (the feed's "7e-05" is a double here
    // by design: donors feed the numeric risk model)
    val got = donors.map(r => (r.getAs[String]("match_key"),
      r.getAs[Double]("score"),
      r.getAs[String]("scoring_elements").toDouble,
      s"https://api.first.org/data/v1/epss?cve=${r.getAs[String]("match_key")}"
    )).toSet
    val wantSet = want.map { c =>
      val (_, value, elements) = c.severities.head
      (c.id, value.toDouble, elements.toDouble, c.references.head._2)
    }.toSet
    assert(got == wantSet,
      s"epss differs: missing=${(wantSet -- got).take(3)}" +
        s" extra=${(got -- wantSet).take(3)}")
    assert(got.size == 27)
  }

  // ------------------------------------------------------------ archlinux
  withRef("archlinux: captured AVG advisories match v2 expected") {
    val sp = spark
    import sp.implicits._
    val rows = ArchIngest.parse(sp,
      Seq(("archlinux", RefCapture.text("archlinux/archlinux-multi.json")))
        .toDF("datasource_id", "json")).collect().toSeq
    val want = RefCapture.loadExpected(
      "archlinux/archlinux_advisoryv2-expected.json")
    RefCapture.assertMatch("archlinux", rows.map(RefCapture.canonRow), want)
  }

  // --------------------------------------------------------------- alpine
  withRef("alpine: captured secdb matches v2 expected") {
    val sp = spark
    import sp.implicits._
    val rows = AlpineIngest.parse(sp,
      Seq(("alpine_linux", "v3.11/main.json",
        RefCapture.text("alpine/v3.11/main.json")))
        .toDF("datasource_id", "path", "json")).collect().toSeq
    val want = RefCapture.loadExpected("alpine/expected-advisories-v3.3.json")
    RefCapture.assertMatch("alpine", rows.map(RefCapture.canonRow), want)
  }

  // ------------------------------------------------------------------ nvd
  withRef("nvd: captured API items (incl. rejected) match v2 expected") {
    val sp = spark
    import sp.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def items(rel: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      mapper.readTree(RefCapture.text(rel)).get("vulnerabilities")
        .elements().asScala.map(_.toString).toSeq
    }
    for ((payload, expected) <- Seq(
        ("nvd_v2/nvd_test.json", "nvd_v2/nvd-expected.json"),
        ("nvd_v2/rejected_nvd.json", "nvd_v2/nvd-rejected-expected.json"))) {
      val rows = NvdIngest.parse(sp,
        items(payload).map(("nvd", _)).toDF("datasource_id", "json"))
        .collect().toSeq
      val want = RefCapture.loadExpected(expected)
      RefCapture.assertMatch(s"nvd/$payload",
        rows.map(RefCapture.canonRow), want)
    }
  }

  // ------------------------------------------------------------------ osv
  // pypa/github/oss-fuzz OSV payloads through the shared OSV parser, with
  // each importer's supported-ecosystem set (pypa_importer.py:67,
  // github_osv_importer.py:54-63, oss_fuzz.py:63). url facet skipped:
  // the reference test injects a dummy advisory_url ("https://test.com").
  withRef("osv: captured pypa/github/oss-fuzz files match v2 expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val cases = Seq(
      ("pypa", (1 to 8).map(i => s"pypa/pypa-$i.yaml" ->
        s"pypa/pypa-expected-$i.json"), Set("pypi")),
      ("github", (1 to 4).map(i => s"github/github-$i.json" ->
        s"github/github-expected-$i.json"),
        Set("pypi", "npm", "maven", "composer", "hex", "gem", "nuget",
          "cargo")),
      ("oss-fuzz", (1 to 3).map(i => s"oss-fuzz/oss-fuzz-$i.yaml" ->
        s"oss-fuzz/oss-fuzz-expected-$i.json"), Set("generic")))
    for ((src, files, ecosystems) <- cases; (payload, expected) <- files) {
      val rows = OsvIngest.parseOne(yaml, src,
        RefCapture.text(s"osv_test/$payload"),
        supported = Some(ecosystems)).toSeq
      val want = RefCapture.loadExpected(s"osv_test/$expected")
      RefCapture.assertMatch(s"osv/$payload",
        rows.map(RefCapture.canonRow), want, skip = Set("url"))
    }
  }

  // --------------------------------------------------------------- gitlab
  // The captured gitlab expected files are v1-format: no advisory_id
  // (the identifier lives in aliases) and severities dropped — our v2
  // parser keeps the cvss vectors, so that facet is asserted separately.
  withRef("gitlab: captured advisories match expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    for (t <- Seq("composer", "gem", "golang", "maven", "npm", "nuget",
        "pypi")) {
      val rows = GitlabIngest.parseOne(yaml, "gitlab", s"$t.yaml",
        RefCapture.text(s"gitlab/$t.yaml")).toSeq
      val want = RefCapture.loadExpected(s"gitlab/$t-expected.json")
      val got = rows.map(RefCapture.canonRow)
        .map(c => c.copy(id = ""))
      // golang-expected joins title+description with ". " where every
      // other capture (and utils.build_description) uses "\n" — a stale
      // v1 artifact; the content is asserted below instead
      // golang-expected is also missing its url (every sibling capture
      // carries the blob url we emit)
      val skip = Set("severities") ++
        (if (t == "golang") Set("summary", "url") else Set.empty[String])
      RefCapture.assertMatch(s"gitlab/$t", got, want, skip = skip,
        key = _ => "one")
      if (t == "golang") {
        assert(rows.head.summary.startsWith(
          "Local directory executable lookup in sops (Windows-only)\n"))
        assert(rows.head.summary.contains("### Impact"))
      }
      assert(rows.forall(_.severities.forall(s =>
        s.scoring_system.startsWith("cvss"))))
    }
  }

  // --------------------------------------------------------- apache httpd
  withRef("apache_httpd: captured CVE json matches expected") {
    val sp = spark
    import sp.implicits._
    for (cve <- Seq("CVE-1999-1199", "CVE-2017-9798", "CVE-2021-44224",
        "CVE-2022-28614")) {
      val rows = ApacheHttpdIngest.parse(sp,
        Seq(("apache_httpd", RefCapture.text(s"apache_httpd/$cve.json")))
          .toDF("datasource_id", "json")).collect().toSeq
      val want = RefCapture.loadExpected(
        s"apache_httpd/$cve-apache-httpd-expected.json")
      // v1 format: the CVE id lives in aliases, not advisory_id. Our
      // fixed_vers pins (timeline releases) are richer than the
      // reference, which encodes fixes ONLY as inverted != constraints
      // inside the affected range (apache_httpd_importer.py:339-346) —
      // assert the pins equal the != versions, then blank them for the
      // facet compare.
      val got = rows.map(RefCapture.canonRow).map(c => c.copy(
        id = "", aliases = c.aliases + rows.head.advisory_id,
        packages = c.packages.map { case (p, (aff, fix)) =>
          assert(fix == aff.filter(_.startsWith("!=")).map(_.drop(2)),
            s"fixed pins should mirror the != releases: $fix vs $aff")
          p -> (aff, Set.empty[String])
        }))
      // datePublished skipped: the v2 pipeline sets it from the
      // timeline "public" entry (apache_httpd_importer.py:279-282,
      // matching us); the v1 expected predates that and has null
      RefCapture.assertMatch(s"apache_httpd/$cve", got, want,
        skip = Set("datePublished"), key = _ => "one")
    }
  }

  // -------------------------------------------------------------- openssl
  withRef("openssl: captured secjson records match v2 expected") {
    val sp = spark
    import sp.implicits._
    import scala.jdk.CollectionConverters._
    val dir = RefCapture.root.resolve("openssl/release_metadata/secjson")
    val files = java.nio.file.Files.list(dir).iterator().asScala.toSeq
    val rows = OpensslIngest.parse(sp,
      files.map(f => ("openssl", java.nio.file.Files.readString(f)))
        .toDF("datasource_id", "json")).collect().toSeq
    val want = RefCapture.loadExpected(
      "openssl/release_metadata/openssl_advisoryv2-expected.json")
    RefCapture.assertMatch("openssl", rows.map(RefCapture.canonRow), want)
  }

  withRef("openssl: captured ranges drive unfurl across letter and " +
      "era boundaries") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._

    // the real release-history shapes the openssl scheme must order:
    // legacy letter patches (incl. the post-z za..zh tail) and the
    // 3.x semver era with prereleases
    val probeVersions = Seq(
      "0.9.6", "0.9.6e", "0.9.7", "0.9.7l", "0.9.8", "0.9.8c", "0.9.8d",
      "0.9.8n", "0.9.8za", "0.9.8zh", "1.0.0", "1.0.0p", "1.0.1",
      "1.0.1j", "1.0.1k", "1.1.1", "1.1.1a", "1.1.1t", "3.0.0-alpha1",
      "3.0.0", "3.0.7", "3.0.8", "3.2.0", "3.2.5", "3.2.6", "3.3.5")

    // independent openssl comparator for the probe grammar (univers
    // OpensslVersion: legacy (maj,min,build,letters) tuples below the
    // semver era, prerelease below its release)
    def cmp(a: String, b: String): Int = {
      val lx = raw"^(\d+)\.(\d+)\.(\d+)([a-z]*)$$".r
      def era(s: String) = if (s.takeWhile(_.isDigit).toInt >= 3) 1 else 0
      if (era(a) != era(b)) return era(a) - era(b)
      def semTuple(s: String) = {
        val (core, pre) = s.span(_ != '-')
        val Array(x, y, z) = core.split('.').map(_.toInt)
        (x, y, z, if (pre.isEmpty) "\uffff" else pre)
      }
      if (era(a) == 1) {
        Ordering[(Int, Int, Int, String)].compare(semTuple(a), semTuple(b))
      } else (a, b) match {
        case (lx(a1, a2, a3, ap), lx(b1, b2, b3, bp)) =>
          Ordering[(Int, Int, Int, String)].compare(
            (a1.toInt, a2.toInt, a3.toInt, ap),
            (b1.toInt, b2.toInt, b3.toInt, bp))
      }
    }
    def contains(range: String, v: String): Boolean =
      range.stripPrefix("vers:openssl/").split('|').forall { c =>
        if (c.startsWith(">=")) cmp(v, c.drop(2)) >= 0
        else if (c.startsWith("<=")) cmp(v, c.drop(2)) <= 0
        else if (c.startsWith("<")) cmp(v, c.drop(1)) < 0
        else if (c.startsWith("=")) cmp(v, c.drop(1)) == 0
        else cmp(v, c) == 0
      }

    val dir = RefCapture.root.resolve("openssl/release_metadata/secjson")
    val files = java.nio.file.Files.list(dir).iterator().asScala.toSeq
    val adv = OpensslIngest.parse(sp,
      files.map(f => ("openssl", java.nio.file.Files.readString(f)))
        .toDF("datasource_id", "json"))
    val imp = adv.select(col("advisory_id").as("avid"),
        explode(col("affected")).as("a"))
      .select(col("avid"), col("a.purl").as("base_purl"),
        col("a.affecting_vers"), col("a.fixed_vers"))
    val rangesByAvid = imp.select("avid", "affecting_vers").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
    assert(rangesByAvid.nonEmpty)
    // at least one captured range has a LETTER upper bound — the class
    // the generic fallback never modeled as a dedicated scheme
    assert(rangesByAvid.values.flatten
      .exists(r => r.matches(""".*\|<[0-9.]+[a-z]$""")), rangesByAvid)

    val versionsDim = probeVersions
      .map(v => ("pkg:openssl/openssl", v)).toDF("base_purl", "version")
    val affected = graft.derive.AdvisoryDerive.unfurl(imp, versionsDim)
      .filter(col("is_affected")).select("avid", "version")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (for {
      (avid, ranges) <- rangesByAvid.toSeq
      v <- probeVersions
      if ranges.exists(contains(_, v))
    } yield (avid, v)).toSet
    assert(affected == expected,
      s"unfurl vs independent openssl order:\n  only engine: ${
        affected -- expected}\n  only expected: ${expected -- affected}")

    // the era split is SHARP vs the old generic fallback: a 3.0.x range
    // must not catch the 3.0.0 prereleases (generic ordered
    // 3.0.0-alpha1 ABOVE 3.0.0 and inside <=3.0.7)
    val eraRange = rangesByAvid.values.flatten
      .find(_.matches(""".*>=3\.0\.0\|<=3\.0\.7$"""))
    eraRange.foreach { r =>
      assert(!contains(r, "3.0.0-alpha1"))
      assert(!affected.exists(_._2 == "3.0.0-alpha1") ||
        expected.exists(_._2 == "3.0.0-alpha1"))
    }
  }

  // --------------------------------------------------------------- redhat
  withRef("redhat: captured CSAF advisories match v2 expected") {
    val sp = spark
    import sp.implicits._
    val files = Seq("2025/rhba-2024_11505.json", "2025/rhba-2025_0409.json",
      "2025/rhba-2025_1079.json", "2025/rhea-2025_2418.json",
      "2010/rhsa-2010_0002.json", "2025/rhsa-2025_0002.json")
    val rows = RedhatIngest.parse(sp,
      files.map(f => ("redhat", f,
        RefCapture.text(s"redhat/csaf_2_0/$f")))
        .toDF("datasource_id", "path", "json")).collect().toSeq
    val want = RefCapture.loadExpected("redhat/redhat_advisoryv2-expected.json")
    RefCapture.assertMatch("redhat", rows.map(RefCapture.canonRow), want)
  }

  // --------------------------------------------------------- ubuntu (OSV)
  withRef("ubuntu: captured security-notice OSV files match v2 expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val files = Seq("2001/UBUNTU-CVE-2001-1593", "2005/UBUNTU-CVE-2005-1515",
      "2010/UBUNTU-CVE-2010-0751", "2015/UBUNTU-CVE-2015-0209",
      "2020/UBUNTU-CVE-2020-1944", "2025/UBUNTU-CVE-2025-14345")
    val rows = files.flatMap(f => OsvIngest.parseOne(yaml, "ubuntu",
      RefCapture.text(s"ubuntu/ubuntu_security_notices/osv/cve/$f.json"),
      supported = Some(Set("deb"))))
    val want = RefCapture.loadExpected(
      "ubuntu/ubuntu_osv_advisoryv2-expected.json")
    RefCapture.assertMatch("ubuntu", rows.map(RefCapture.canonRow), want,
      skip = Set("url"))
  }

  // ----------------------------------------------------------- project-kb
  withRef("project-kb: captured statements + MSR2019 csv match expected") {
    val sp = spark
    import sp.implicits._
    val yaml = new org.yaml.snakeyaml.Yaml()
    val ids = Seq("CVE-2018-16406", "CVE-2019-1020012", "CVE-2019-16942",
      "CVE-2019-17531")
    val rows = ids.flatMap(id => ProjectKbStatementsIngest.parseOne(yaml,
      "project_kb_statements", s"statements/$id/statement.yaml",
      RefCapture.text(s"project-kb/statements/$id/statement.yaml")))
    val want = RefCapture.loadExpected("project-kb/kb-statements-expected.json")
    // url skipped: the reference test injects a mocked advisory url
    RefCapture.assertMatch("project-kb/statements",
      rows.map(RefCapture.canonRow), want, skip = Set("url"))

    val msr = FixCommitDatasetsIngest.projectKbMsr2019(sp,
      RefCapture.root.resolve(
        "project-kb/MSR2019/dataset/vulas_db_msr2019_release.csv").toString)
      .collect().toSeq
    val wantMsr = RefCapture.loadExpected("project-kb/kbmsr2019-expected.json")
    RefCapture.assertMatch("project-kb/msr2019",
      msr.map(RefCapture.canonRow), wantMsr)
  }

  // ----------------------------------------------------------------- aosp
  withRef("aosp: captured quarkslab dataset files match v2 expected") {
    val sp = spark
    import sp.implicits._
    for (i <- 1 to 5) {
      val rows = FixCommitDatasetsIngest.aosp(sp,
        Seq(("aosp", s"cves/CVE-aosp_test$i.json",
          RefCapture.text(s"aosp/CVE-aosp_test$i.json")))
          .toDF("datasource_id", "path", "json")).collect().toSeq
      val want = RefCapture.loadExpected(s"aosp/CVE-aosp_test$i-expected.json")
      RefCapture.assertMatch(s"aosp/$i", rows.map(RefCapture.canonRow), want)
    }
  }

  // ----------------------------------------------------------- linux kernel
  withRef("linux_kernel: captured security.txt matches v2 expected") {
    val sp = spark
    import sp.implicits._
    val rows = FixCommitDatasetsIngest.linuxKernelCves(sp,
      Seq(("3.12_security.txt",
        RefCapture.text("linux_kernel/data/3.12/3.12_security.txt")))
        .toDF("path", "text")).collect().toSeq
    val want = RefCapture.loadExpected(
      "linux_kernel/expected-linux-kernel-advisory.json")
    RefCapture.assertMatch("linux_kernel", rows.map(RefCapture.canonRow), want)
  }

  // --------------------------------------------------------------- kafka
  withRef("apache_kafka: captured cve-list page matches v2 expected") {
    val sp = spark
    import sp.implicits._
    val rows = ApacheKafkaIngest.parse(sp,
      Seq(("apache_kafka",
        RefCapture.text("apache_kafka/cve-list-2026_01_23.html")))
        .toDF("datasource_id", "html")).collect().toSeq
    val want = RefCapture.loadExpected(
      "apache_kafka/cve-list-2026_01_23-expected.json")
    RefCapture.assertMatch("apache_kafka",
      rows.map(RefCapture.canonRow), want)
  }

  // ----------------------------------------------------------------- curl
  withRef("curl: captured advisory JSON matches expected") {
    val sp = spark
    import sp.implicits._
    for (i <- 1 to 3) {
      val rows = CurlIngest.parse(sp,
        Seq(("curl", RefCapture.text(s"curl/curl_advisory_mock$i.json")))
          .toDF("datasource_id", "json")).collect().toSeq
      val want = RefCapture.loadExpected(
        s"curl/expected_curl_advisory_output$i.json")
      val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
      RefCapture.assertMatch(s"curl/$i", got, want, key = _ => "one")
    }
  }

  // ----------------------------------------------------------- postgresql
  withRef("postgresql: captured security page matches expected") {
    val sp = spark
    import sp.implicits._
    val rows = PostgresqlIngest.parse(sp,
      Seq(("postgresql", RefCapture.text("postgresql/advisories.html")))
        .toDF("datasource_id", "html")).collect().toSeq
    // v1 format: the CVE lives in aliases; the capture's fixed_version
    // is the page's raw string while our fixed pins carry generic
    // padding (12.3 → 12.3.0, consistent with the affected side) — pad
    // the expected side the same way before comparing
    val want = RefCapture.loadExpected(
      "postgresql/parse-advisory-postgresql-expected.json")
      .map(c => c.copy(packages = c.packages.map { case (p, (a, f)) =>
        p -> (a, f.map(GlibcIngest.genericVersion)) }))
    // our severities keep the calculator VECTOR as scoring_elements
    // (the page links it; the v1 capture dropped it) — blank it for the
    // compare and assert it separately
    assert(rows.forall(_.severities.forall(
      _.scoring_elements.startsWith("CVSS:3.0/"))))
    val got = rows.map(c =>
      RefCapture.canonRow(c).copy(id = "", aliases = Set(c.advisory_id)))
      .map(c => c.copy(severities = c.severities.map(s =>
        (s._1, s._2, ""))))
    RefCapture.assertMatch("postgresql", got, want,
      key = c => c.aliases.toSeq.sorted.mkString(","))
  }

  // ------------------------------------------------------------------ xen
  withRef("xen: captured xsa feed matches expected") {
    val sp = spark
    import sp.implicits._
    // the capture is ONE xsa record; the live feed wraps them as
    // [{"xsas": [...]}] (xen_importer.py:82)
    val feed = s"""[{"xsas":[${RefCapture.text("xen_data.json")}]}]"""
    val rows = XenIngest.parse(sp,
      Seq(("xen", feed)).toDF("datasource_id", "json")).collect().toSeq
    val want = RefCapture.loadExpected("parse-advisory-xen-expected.json")
    val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
    // datePublished skipped: the v2 importer parses public_time
    // (xen_importer.py:94-103, matching us); the v1 capture has null
    RefCapture.assertMatch("xen", got, want, key = _ => "one",
      skip = Set("datePublished"))
  }

  // ---------------------------------------------------------------- istio
  withRef("istio: captured markdown advisory matches expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val rows = IstioIngest.parseOne(yaml, "istio", "test_file.md",
      RefCapture.text("istio/test_file.md")).toSeq
    val want = RefCapture.loadExpected("istio/istio-expected.json")
    val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
    RefCapture.assertMatch("istio", got, want, key = _ => "one")
  }

  // -------------------------------------------------------------- mozilla
  withRef("mozilla: captured mfsa md + yml match expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    for ((f, exp) <- Seq(("mfsa2006-02.md", "expected-md.json"),
        ("mfsa2022-01.yml", "expected-yml.json"))) {
      val rows = MozillaIngest.parseOne(yaml, "mozilla", f,
        RefCapture.text(s"mozilla/$f")).toSeq
      val want = RefCapture.loadExpected(s"mozilla/$exp")
      val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
      // md severity skipped: impact "Moderate" maps to medium in the v2
      // pipeline (mozilla_importer.py:231-233, matching us); the v1
      // capture recorded "none". Likewise v2 parses `announced` into
      // date_published (mozilla_importer.py:173) where the v1 md capture
      // has null.
      // severities skipped both ways with explicit checks below: the v1
      // captures recorded "none" for md (v2 maps Moderate->medium like
      // us) and the TOP-LEVEL impact for every yml CVE (v2 uses the
      // per-CVE impact, mozilla_importer.py:139, like us)
      val skip = Set("severities", "datePublished")
      if (f.endsWith(".md"))
        assert(rows.head.severities.map(_.value) == Seq("medium"))
      else {
        val byCve = rows.map(r => r.aliases.headOption.getOrElse("") ->
          r.severities.map(_.value)).toMap
        assert(byCve("CVE-2022-22736") == Seq("low")) // per-CVE impact
        assert(byCve("CVE-2022-22746") == Seq("high"))
      }
      // the yml capture shows fixed_in packages only on the FIRST
      // per-CVE advisory (the v1 generator was consumed once); the v2
      // pipeline materializes the list for every CVE
      // (mozilla_importer.py:109 list(...)) like we do — blank ours
      // where the capture recorded the artifact, after checking they
      // all carry the same packages
      val wantByKey = want
        .groupBy(c => c.aliases.toSeq.sorted.mkString(",")).view
        .mapValues(_.head).toMap
      val gotAdj = got.map { c =>
        val k = c.aliases.toSeq.sorted.mkString(",")
        if (wantByKey.get(k).exists(_.packages.isEmpty) &&
            c.packages.nonEmpty) {
          assert(c.packages == got.head.packages)
          c.copy(packages = Map.empty)
        } else c
      }
      RefCapture.assertMatch(s"mozilla/$f", gotAdj, want, skip = skip,
        key = c => c.aliases.toSeq.sorted.mkString(","))
    }
  }

  // --------------------------------------------------------------- elixir
  withRef("elixir: captured advisory yml matches expected") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val rows = ElixirIngest.parseOne(yaml, "elixir_security", "test_file.yml",
      RefCapture.text("elixir_security/test_file.yml")).toSeq
    val want = RefCapture.loadExpected("elixir_security/elixir-expected.json")
    val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
    RefCapture.assertMatch("elixir", got, want, key = _ => "one")
  }

  // --------------------------------------------------------- vulnrichment
  withRef("vulnrichment: captured CVE 5.x records match expected") {
    val sp = spark
    import sp.implicits._
    for (i <- 1 to 3) {
      val rows = VulnrichmentIngest.parse(sp,
        Seq(("vulnrichment",
          RefCapture.text(s"vulnrichment/vulnrichment-data$i.json")))
          .toDF("datasource_id", "json")).collect().toSeq
      val want = RefCapture.loadExpected(
        s"vulnrichment/vulnrichment-data$i-expected.json")
      val got = rows.map(c =>
        RefCapture.canonRow(c).copy(id = "", aliases = Set(c.advisory_id)))
      // url skipped: the reference test injects a dummy advisory url
      RefCapture.assertMatch(s"vulnrichment/$i", got, want,
        key = _ => "one", skip = Set("url"))
    }
  }

  // ----------------------------------------------------------- github api
  // 100 REAL GraphQL edges per ecosystem through the
  // securityVulnerabilities shape the live pipeline pages. Per-edge
  // rows may repeat an advisory (one edge per package), so the compare
  // is a sorted multiset of canon strings instead of keyed alignment.
  withRef("github_api: captured GraphQL pages match expected") {
    val sp = spark
    import sp.implicits._
    for (eco <- Seq("cargo", "composer", "gem", "golang", "maven", "npm",
        "nuget", "pypi")) {
      val rows = GithubIngest.parseVulnerabilities(sp,
        Seq(("github", eco, RefCapture.text(s"github_api/$eco.json")))
          .toDF("datasource_id", "package_type", "json")).collect().toSeq
      val want = RefCapture.loadExpected(s"github_api/$eco-expected.json")
      val got = rows.map(RefCapture.canonRow).map(_.copy(id = ""))
      assert(got.size == want.size,
        s"github/$eco row count: ${got.size} vs ${want.size}")
      val (gs, ws) = (got.map(_.toString).sorted, want.map(_.toString).sorted)
      gs.zip(ws).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"github/$eco[$i]:\n  ours=$g\n  ref =$w")
      }
    }
  }

  // ------------------------------------------------------------------ npm
  withRef("npm: captured security-wg advisory matches expected") {
    val sp = spark
    import sp.implicits._
    val rows = NodeSecurityIngest.parse(sp,
      Seq(("npm", RefCapture.text("npm/npm_sample.json")))
        .toDF("datasource_id", "json")).collect().toSeq
    val want = RefCapture.loadExpected("npm/parse-advisory-npm-expected.json")
    // v1 capture: no advisory_id and vectorless severities — the v2
    // pipeline (and we) keep the vector, so blank it after asserting
    // ours carries the richer value
    assert(rows.head.severities.head.scoring_elements
      .startsWith("CVSS:3.0/"))
    assert(rows.head.url.endsWith("/vuln/npm/152.json"))
    // ...and the v1 capture records the first patched VERSION where the
    // v2 pipeline (and we) keep the patched RANGE — compare its floor
    val got = rows.map(RefCapture.canonRow).map(c => c.copy(id = "",
      severities = c.severities.map(s => (s._1, s._2, "")),
      packages = c.packages.map { case (p, (a, f)) =>
        p -> (a, f.map(_.stripPrefix(">="))) }))
    RefCapture.assertMatch("npm", got, want, key = _ => "one",
      skip = Set("datePublished"))
    // created_at parses as the v2 date_published
    assert(rows.head.date_published.get.toString.startsWith("2016-10-27"))
  }

  // --------------------------------------------------------------- tomcat
  withRef("apache_tomcat: captured security page matches expected") {
    val sp = spark
    import sp.implicits._
    val rows = TomcatIngest.parse(sp,
      Seq(("apache_tomcat", "https://tomcat.apache.org/security-9.html",
        RefCapture.text("apache_tomcat/apache_tomcat-selected-advisories.html")))
        .toDF("datasource_id", "page_url", "html")).collect().toSeq
    val want = RefCapture.loadExpected(
      "apache_tomcat/parse-apache_tomcat-selected-advisories-expected.json")
    // v1 capture: the CVE lives in aliases; the fix is encoded ONLY as
    // an inverted != constraint inside the affected range (the v2
    // importer does the same, apache_tomcat_importer.py:178-184) while
    // we keep an explicit fixed pin — fold ours into != before the
    // compare, and assert the pins mirror the != versions
    val got = rows.map(RefCapture.canonRow).map(c => c.copy(id = "",
      packages = c.packages.map { case (p, (aff, fix)) =>
        p -> (aff ++ fix.map("!=" + _), Set.empty[String]) }))
    // summary skipped: the v1 capture blanks it on multi-CVE headings
    // where we keep the strong title (the v2 importer keeps it too).
    // For the CVEs in the v1 importer's HARDCODED
    // corrective_data_mapping (apache_tomcat.py:33-111 overrides the
    // messy page lines by hand), the capture's ranges are the
    // correction table, not the page — our parser reads the page, so
    // those advisories compare everything BUT packages and assert a
    // non-empty parse instead.
    val corrected = Set("CVE-2009-0580", "CVE-2008-4308", "CVE-2005-4836",
      "CVE-2002-0935", "CVE-2009-2901", "CVE-2008-3271", "CVE-2002-0493",
      "CVE-2005-0808", "CVE-2007-3382", "CVE-2007-3384", "CVE-2007-3385",
      "CVE-2001-1563", "CVE-2018-8014", "CVE-2018-1336")
    def keyOf(c: RefCapture.Canon) = c.aliases.toSeq.sorted.mkString(",")
    // the v1 importer attributed the "Fix for CVE-2020-9484 was
    // incomplete" heading to EVERY CVE link in it — including the one
    // inside <strong> — yielding a duplicate 9484 advisory; we (like a
    // careful reader) give that paragraph to CVE-2021-25329 alone, so
    // the pair compares by explicit assertion instead
    val misattributed = Set("CVE-2020-9484", "CVE-2021-25329")
    val byKey = got.groupBy(keyOf)
    assert(byKey("CVE-2021-25329").head.packages
      ("pkg:apache/tomcat")._1.contains("!=9.0.43"))
    assert(byKey("CVE-2020-9484").head.packages.nonEmpty)
    val gotK = got.filterNot(c => misattributed(keyOf(c)))
    val wantK = want.filterNot(c => misattributed(keyOf(c)))
    val (gotCorr, gotPage) = gotK.partition(c => corrected(keyOf(c)))
    val (wantCorr, wantPage) = wantK.partition(c => corrected(keyOf(c)))
    RefCapture.assertMatch("apache_tomcat", gotPage, wantPage,
      skip = Set("url", "references", "summary"), key = keyOf)
    RefCapture.assertMatch("apache_tomcat/corrected", gotCorr, wantCorr,
      skip = Set("url", "references", "summary", "packages"), key = keyOf)
    assert(gotCorr.forall(_.packages.nonEmpty))
    assert(rows.count(_.summary.nonEmpty) >= 15)
    // our reference row carries the page; the capture has none usable
    assert(rows.forall(_.references.exists(
      _.url.contains("tomcat.apache.org"))))
  }

  // --------------------------------------------------------------- gentoo
  withRef("gentoo: captured GLSA XMLs match v2 expected") {
    for (glsa <- Seq("glsa-201709-09", "glsa-202511-02", "glsa-202512-01")) {
      val rows = GentooIngest.parseOne("gentoo",
        RefCapture.text(s"gentoo_v2/$glsa.xml")).toSeq
      val want = RefCapture.loadExpected(s"gentoo_v2/$glsa-expected.json")
      RefCapture.assertMatch(s"gentoo/$glsa",
        rows.map(RefCapture.canonRow), want)
    }
  }

  // --------------------------------------------------- vcs fix commits
  withRef("fix commits: captured grouped input matches advisory golden") {
    // test_collect_fix_commit.py:76-88 — collect_advisories over the
    // pre-grouped capture (repo_url="https://github.com/test/repo"),
    // compared to expected_linux_advisory_output.json. The grouped keys
    // are the vulnerability ids (the messages mention OTHER CVE ids
    // that must NOT be re-extracted at this stage).
    val sp = spark
    import sp.implicits._
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val grouped = mapper.readTree(
      RefCapture.text("fix_commits/grouped_commits_input.json"))
    val rowsIn = grouped.properties().asScala.toSeq.flatMap { e =>
      e.getValue.elements().asScala.toSeq.map(pair =>
        (e.getKey, pair.get(0).asText, pair.get(1).asText))
    }.toDF("vuln_id", "commit_hash", "message")
    val repo = "https://github.com/test/repo"
    val rows = FixCommitsIngest.fromGrouped(sp, rowsIn, repo,
      "repo_fix_commits").collect().toSeq
    val want = RefCapture.loadExpected(
      "fix_commits/expected_linux_advisory_output.json")
    // the golden's fixed_by_commit_patches travel as commitLinks rows in
    // the engine (AdvisoryRow has no patch field) — compared below;
    // skip that facet on the advisory compare
    RefCapture.assertMatch("fix_commits", rows.map(RefCapture.canonRow),
      want, skip = Set("commits"))
    assert(rows.forall(r => r.references.forall(ref =>
      ref.url == s"$repo/tree/${ref.reference_id}" &&
        ref.reference_type == "commit")))
    val links = FixCommitsIngest.commitLinks(sp,
      rowsIn.select("commit_hash", "message"), repo, "repo_fix_commits")
      .collect().map(r => (r.getAs[String]("vcs_url"),
        r.getAs[String]("commit_hash"))).toSet
    val wantPatches = want.flatMap(c =>
      c.commits.collect { case ("fixed", h) => (repo, h) }).toSet
    // commitLinks re-extracts ids from messages; the golden rows whose
    // message names a DIFFERENT id than the grouping key still carry the
    // same (vcs_url, hash) patch pair, which is what the links table is
    assert(links == wantPatches,
      s"commit links differ: ours=$links ref=$wantPatches")
  }
}
