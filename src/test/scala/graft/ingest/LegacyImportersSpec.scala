package graft.ingest

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.model.AffectedRow
import graft.operators.SparkTestSession

/** The five legacy v1-only importers (gsd, kaybee, rust, suse_backports,
  * ubuntu_usn) — reference-abandoned but implemented here so an old
  * deployment can replay the feeds. gsd and ubuntu_usn validate against
  * the reference's CAPTURED fixtures + expected files; rust against the
  * inline goldens of test_rust.py (mocked crates catalog); suse against
  * an independent re-derivation of its captured YAML; kaybee against
  * authored statements pinning the reference parser's semantics
  * (importers/kaybee.py) including its text/notes summary gate. */
class LegacyImportersSpec extends AnyFunSuite with SparkTestSession {

  private def withRef(name: String)(body: => Unit): Unit =
    test(name) {
      assume(RefCapture.available, "reference test_data checkout not present")
      body
    }

  private val fixtures = Paths.get("src/test/resources/fixtures")

  // ------------------------------------------------------------- gsd
  withRef("gsd: captured advisories match the reference expected files") {
    val sp = spark
    import sp.implicits._
    val cases = Seq("GSD-2016-20005", "GSD-2022-4030", "GSD-2002-0001",
      "GSD-2006-0326")
    val raw = cases.map(c =>
      ("gsd", s"gsd/$c.json", RefCapture.text(s"gsd/$c.json")))
      .toDF("datasource_id", "path", "json")
    val rows = GsdIngest.parse(sp, raw).collect().toSeq
    val want = cases.flatMap(c =>
      RefCapture.loadExpected(s"gsd/$c-expected.json"))
    // v1 expected files carry no advisory_id — align by alias set
    RefCapture.assertMatch("gsd", rows.map(RefCapture.canonRow), want,
      key = c => c.aliases.toSeq.sorted.mkString(","))
  }

  test("gsd: build_description composes title and description") {
    assert(GsdIngest.buildDescription("", "desc") == "desc")
    assert(GsdIngest.buildDescription("title", "") == "title")
    assert(GsdIngest.buildDescription("t", "body") == "t\nbody")
    assert(GsdIngest.buildDescription("t", "has t inside") == "has t inside")
  }

  // ------------------------------------------------------ ubuntu_usn
  withRef("ubuntu_usn: captured bz2 db matches the reference expected") {
    val sp = spark
    import sp.implicits._
    val bytes = Files.readAllBytes(
      RefCapture.root.resolve("ubuntu_usn_db/database-all.json.bz2"))
    val json = UbuntuUsnIngest.decompressBz2(bytes)
    val rows = UbuntuUsnIngest.parse(sp,
      Seq(("ubuntu_usn", json)).toDF("datasource_id", "text"))
      .collect().toSeq
    val want = RefCapture.loadExpected("ubuntu_usn_db/ubuntu-usn-expected.json")
    RefCapture.assertMatch("ubuntu_usn", rows.map(RefCapture.canonRow),
      want, key = c => c.aliases.toSeq.sorted.mkString(",") + "|" +
        c.references.toSeq.sorted.mkString(","))
  }

  test("ubuntu_usn: is_cve prefix-match drops prose entries") {
    // utils.py:52-53 uses re.match — an anchored PREFIX match
    assert(UbuntuUsnIngest.isCve("CVE-2006-2313"))
    assert(UbuntuUsnIngest.isCve("cve-2006-2313")) // IGNORECASE
    assert(UbuntuUsnIngest.isCve("CVE-2006-2313 and friends")) // prefix
    assert(!UbuntuUsnIngest.isCve("python-pgsql vulnerabilities"))
    assert(!UbuntuUsnIngest.isCve("CVE-06-1"))
  }

  // ------------------------------------------------------------ rust
  withRef("rust: RUSTSEC-2021-0032 matches test_rust.py's golden") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(("rust", "crates/RUSTSEC-2021-0032.md",
      RefCapture.text("rust/RUSTSEC-2021-0032.md")))
      .toDF("datasource_id", "path", "text")
    // the MOCKED_CRATES_API_VERSIONS catalog of test_rust.py:28-38
    val catalog = Seq(("byte_struct", "0.6.1"), ("byte_struct", "0.6.0"),
      ("byte_struct", "1.0.0"))
      .toDF("crate", "version")
      .withColumn("released_at",
        org.apache.spark.sql.functions.lit(null).cast("timestamp"))
    val rows = RustIngest.parse(sp, raw, catalog).collect().toSeq
    assert(rows.size == 1)
    val r = rows.head
    assert(r.advisory_id == "RUSTSEC-2021-0032")
    assert(r.aliases.contains("CVE-2021-28033"))
    assert(r.summary == "") // no TOML description; md body is ignored
    assert(r.affected == Seq(AffectedRow("pkg:cargo/byte_struct",
      "vers:cargo/=0.6.0", "vers:cargo/=0.6.1")))
    assert(r.references.map(x => (x.reference_id, x.url)).toSet == Set(
      ("", "https://github.com/wwylele/byte-struct-rs/issues/1"),
      ("RUSTSEC-2021-0032",
        "https://rustsec.org/advisories/RUSTSEC-2021-0032.html")))
  }

  withRef("rust: TOML front matter extraction (test_load_toml_from_md)") {
    val doc = RustIngest.parseToml(RustIngest.tomlLines(
      RefCapture.text("rust/CVE-2019-16760.md")))
    val adv = doc("advisory")
    assert(adv("id") == "CVE-2019-16760")
    assert(adv("package") == "cargo")
    assert(adv("date") == "2019-09-30")
    assert(adv("aliases") == Seq("GHSA-phjm-8x66-qw4r"))
    assert(adv("url") == "https://groups.google.com/forum/#!topic/rustlang-security-announcements/rVQ5e3TDnpQ")
    assert(doc("versions")("patched") == Seq(">= 1.26.0"))
  }

  test("rust: categorize_versions ports the reference quirks") {
    // test_categorize_versions (flatbuffers)
    assert(RustIngest.categorizeVersions(
      Set("0.3.0", "0.5.0", "0.6.5"),
      unaffectedRanges = Seq("< 0.4.0"),
      affectedRanges = Seq(">= 0.4.0", "<= 0.6.0"),
      resolvedRanges = Seq(">= 0.6.1")) ==
      (Set("0.3.0", "0.6.5"), Set("0.5.0")))
    // without affected ranges: uncategorized default to AFFECTED
    assert(RustIngest.categorizeVersions(
      Set("1.0", "1.1", "2.0", "2.1", "3.0", "3.1"),
      Seq("< 1.2"), Seq.empty, Seq(">= 3.0")) ==
      (Set("1.0", "1.1", "3.0", "3.1"), Set("2.0", "2.1")))
    // with only affected ranges: uncategorized default to UNAFFECTED
    assert(RustIngest.categorizeVersions(
      Set("1.0", "1.1", "2.0", "2.1", "3.0", "3.1"),
      Seq.empty, Seq("> 1.2", "<= 2.1"), Seq.empty) ==
      (Set("1.0", "1.1", "3.0", "3.1"), Set("2.0", "2.1")))
    // no ranges at all: both empty
    assert(RustIngest.categorizeVersions(
      Set("1.0", "2.0"), Seq.empty, Seq.empty, Seq.empty) ==
      (Set.empty[String], Set.empty[String]))
  }

  // -------------------------------------------------- suse_backports
  withRef("suse_backports: captured YAML fully re-derived") {
    val text = RefCapture.text("suse_backports/backports-sle11-sp0.yaml")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val rows = SuseBackportsIngest.parseFile(yaml, "suse_backports", text)
    // independent re-derivation of every (pkg, version, vuln) triple
    val doc = yaml.load[Object](text)
      .asInstanceOf[java.util.List[Object]].get(0)
      .asInstanceOf[java.util.Map[String, Object]]
    val triples = for {
      (pkg, body) <- doc.get("packages")
        .asInstanceOf[java.util.Map[String, Object]].asScala.toSeq
      (ver, vulns) <- body.asInstanceOf[java.util.Map[String, Object]]
        .get("fixed").asInstanceOf[java.util.Map[String, Object]]
        .asScala.toSeq
      v <- vulns.asInstanceOf[java.util.List[Object]].asScala
    } yield (pkg, String.valueOf(ver), String.valueOf(v))
    assert(rows.size == triples.size && triples.nonEmpty)
    val got = rows.map(r => (r.affected.head.purl,
      r.affected.head.fixed_vers, r.aliases.head)).toSet
    assert(got == triples.map { case (p, ver, v) =>
      (s"pkg:rpm/opensuse/$p", s"vers:rpm/=$ver", v) }.toSet)
    // the commented-out reference test's first golden row
    // (test_suse_backports.py:41-55)
    assert(got.contains(("pkg:rpm/opensuse/MozillaFirefox",
      "vers:rpm/=3.0.10-1.1.1", "CVE-2009-1313")))
    assert(rows.forall(r => r.affected.head.affecting_vers == "" &&
      r.summary == ""))
  }

  // ---------------------------------------------------------- kaybee
  test("kaybee: statement parse with nearest-patched pairing") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val text = Files.readString(
      fixtures.resolve("kaybee/statement-CVE-2014-0050.yaml"))
    val r = KaybeeIngest.parseOne(yaml, "kaybee", text).get
    assert(r.advisory_id == "CVE-2014-0050")
    assert(r.aliases == Seq("CVE-2014-0050"))
    // no top-level `text` key → the reference's gate leaves summary empty
    assert(r.summary == "")
    // both vulnerable versions pair with the single nearest fix
    assert(r.affected.toSet == Set(
      AffectedRow("pkg:maven/commons-fileupload/commons-fileupload",
        "vers:maven/=1.3", "vers:maven/=1.3.1"),
      AffectedRow("pkg:maven/commons-fileupload/commons-fileupload",
        "vers:maven/=1.2.2", "vers:maven/=1.3.1")))
    assert(r.references.map(_.url).toSet == Set(
      "https://github.com/apache/commons-fileupload/69f19444c2bd4c2c84c1bf94f0bdcf4b9196afad",
      "https://github.com/apache/commons-fileupload/c61ff05b3241cb14d989b67bfeb31e67b1530845"))
  }

  test("kaybee: the text/notes summary gate is mirrored verbatim") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val text = Files.readString(
      fixtures.resolve("kaybee/statement-CVE-2017-5645.yaml"))
    val r = KaybeeIngest.parseOne(yaml, "kaybee", text).get
    // top-level `text` present → notes' texts joined (kaybee.py:43-45)
    assert(r.summary == "first note\nsecond note")
    // vulnerable with NO resolved artifact → unpaired pin
    assert(r.affected == Seq(AffectedRow(
      "pkg:maven/org.apache.logging.log4j/log4j-core",
      "vers:maven/=2.8.1", "")))
  }

  test("kaybee: nearest_patched_package bisect-right semantics") {
    import graft.functions.PurlCodec
    def purl(v: String) = PurlCodec.parse(s"pkg:cargo/c@$v")
    val pairs = KaybeeIngest.nearestPatchedPairs(
      Seq(purl("2.0.0"), purl("0.9.0"), purl("1.0.0")),
      Seq(purl("1.0.0"), purl("1.5.0")))
    // sorted by version; a fix EQUAL to the vulnerable version does not
    // pair (bisect_right goes past equals)
    assert(pairs.map { case (v, p) =>
      (v.version, p.map(_.version)) } == Seq(
      ("0.9.0", Some("1.0.0")),
      ("1.0.0", Some("1.5.0")),
      ("2.0.0", None)))
  }

  test("rust: caret/tilde requirements expand to semver-req bounds") {
    // cargo semver-req semantics — a bare GitlabIngest pass would have
    // read `^1.0.5` as a literal pin that matches nothing
    assert(RustIngest.semverContains("^1.0.5", "1.9.9"))
    assert(!RustIngest.semverContains("^1.0.5", "2.0.0"))
    assert(!RustIngest.semverContains("^1.0.5", "1.0.4"))
    assert(RustIngest.semverContains("^0.2.3", "0.2.9"))
    assert(!RustIngest.semverContains("^0.2.3", "0.3.0"))
    assert(RustIngest.semverContains("^0.0.3", "0.0.3"))
    assert(!RustIngest.semverContains("^0.0.3", "0.0.4"))
    assert(RustIngest.semverContains("~1.2.3", "1.2.9"))
    assert(!RustIngest.semverContains("~1.2.3", "1.3.0"))
    assert(RustIngest.semverContains("~1", "1.9.0"))
    assert(!RustIngest.semverContains("~1", "2.0.0"))
    // comma-AND still composes with the expansion
    assert(RustIngest.semverContains("^1.0.0, < 1.5.0", "1.4.9"))
    assert(!RustIngest.semverContains("^1.0.0, < 1.5.0", "1.5.0"))
    // patched = ["^0.6.1"] categorizes like the >= form
    assert(RustIngest.categorizeVersions(Set("0.6.0", "0.6.1", "0.6.5"),
      Seq.empty, Seq.empty, Seq("^0.6.1")) ==
      (Set("0.6.1", "0.6.5"), Set("0.6.0")))
  }

  test("rust: quoted array elements may contain ']' (function paths)") {
    val doc = RustIngest.parseToml(Seq(
      "[affected.functions]",
      "\"byte_struct::<[u8]>::read\" = [",
      "    \"< 0.6.1\",",
      "    \"trait::<[u8; 4]>::x\",",
      "]"))
    assert(doc("affected.functions")("byte_struct::<[u8]>::read") ==
      Seq("< 0.6.1", "trait::<[u8; 4]>::x"))
  }

  test("suse_backports: numeric YAML version keys stringify") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val rows = SuseBackportsIngest.parseFile(yaml, "suse_backports",
      """- name: SLES
        |  packages:
        |    libfoo:
        |      fixed:
        |        2.24:
        |          - CVE-2020-1111
        |        1.0-1.1:
        |          - CVE-2020-2222
        |""".stripMargin)
    // an unquoted `2.24:` parses as a Double key; str(version) keeps it
    assert(rows.map(r => r.affected.head.fixed_vers).toSet ==
      Set("vers:rpm/=2.24", "vers:rpm/=1.0-1.1"))
  }

  test("kaybee: links-only notes and malformed commits stay silent") {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val r = KaybeeIngest.parseOne(yaml, "kaybee",
      """text: present
        |vulnerability_id: CVE-2020-3333
        |notes:
        |  - links:
        |      - https://example.org/only-links
        |  - text: real note
        |fixes:
        |  - id: B
        |    commits:
        |      - id: abc123
        |      - id: def456
        |        repository: https://github.com/o/r
        |""".stripMargin).get
    assert(r.summary == "real note") // no "null" line from the first note
    assert(r.references.map(_.url) == Seq("https://github.com/o/r/def456"))
  }

  test("legacy registry: all five have dedicated parsers") {
    assert(ImporterRegistry.legacyV1.values.map(_._2).forall {
      case ImporterRegistry.Dedicated(e) => e.endsWith(".parse")
      case _ => false
    })
  }
}
