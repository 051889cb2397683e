package graft.export

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.derive.AdvisoryDerive
import graft.ingest.RefCapture
import graft.model.{AdvisoryRow, AffectedRow, ReferenceRow, SeverityRow}
import graft.operators.SparkTestSession

/** Golden-compare of the FederatedCode export sink against the
  * reference's CAPTURED exporter fixtures
  * (test_data/exporters/federate_vulnerabilities, asserted by
  * test_federate_vulnerabilities.py:57-162): the two test advisories
  * ADV-001/ADV-002 serialize through [[FederatedExport.serialize]] and
  * the package index through [[FederatedExport.packageIndex]], then
  * compare SEMANTICALLY (snakeyaml-parsed structures) to the
  * `*-expected.yml` files — the reference writes saneyaml plain
  * scalars while the engine writes quoted flow scalars, so the byte
  * form differs by design; the parsed documents must not.
  *
  * Canonicalization: empty strings and nulls unify (saneyaml renders
  * None as the empty scalar; the engine renders absent fields as "");
  * `published_at` is null on both sides here (no publication time on
  * the captured severities).
  */
class CapturedExportSpec extends AnyFunSuite with SparkTestSession {

  private val yaml = new org.yaml.snakeyaml.Yaml()

  /** Parse + canonicalize: ""→null recursively, so quoting/None
    * conventions drop out of the compare. */
  private def canon(doc: String): Object = {
    def walk(v: Object): Object = v match {
      case s: String if s.isEmpty => null
      case m: java.util.Map[_, _] =>
        val out = new java.util.LinkedHashMap[Object, Object]()
        m.asInstanceOf[java.util.Map[Object, Object]].asScala.foreach {
          case (k, x) => out.put(k, walk(x))
        }
        out
      case l: java.util.List[_] =>
        l.asInstanceOf[java.util.List[Object]].asScala.map(walk).asJava
      case other => other
    }
    walk(yaml.load[Object](doc))
  }

  private def expectedYml(rel: String): Object =
    canon(RefCapture.text("exporters/federate_vulnerabilities/" + rel))

  // the reference test's two fixtures (test_federate_vulnerabilities.py
  // setUp, lines 57-107), re-expressed as engine rows
  private def fixtureAdvisories = {
    val sp = spark
    import sp.implicits._
    AdvisoryDerive.withContentIdAndLatest(Seq(
      AdvisoryRow("test", "ADV-001", "Test advisory",
        Seq("CVE-2025-0001"),
        Seq.empty[ReferenceRow], Seq.empty[SeverityRow], Seq.empty[Int],
        Seq(AffectedRow("pkg:npm/foobar", "vers:npm/<=1.2.3",
          "vers:npm/1.2.4")),
        java.sql.Timestamp.valueOf("2025-06-01 00:00:00"), None,
        "https://example.com/advisory/1", 10),
      AdvisoryRow("test", "ADV-002", "Test advisory2",
        Seq("CVE-2025-0002"),
        Seq(ReferenceRow("https://example.com/vuln1", null, null)),
        Seq(SeverityRow("cvssv3", "8.8",
          "CVSS:3.0/AV:N/AC:L/PR:N/UI:R/S:U/C:H/I:H/A:H", null)),
        Seq(707, 20),
        Seq(AffectedRow("pkg:npm/foobar", "vers:npm/>=1.2.4",
          "vers:npm/2.0.0")),
        java.sql.Timestamp.valueOf("2025-06-01 00:00:00"), None,
        "https://example.com/advisory/2", 10)).toDF())
  }

  test("captured federate_vulnerabilities goldens: advisory documents") {
    assume(RefCapture.available, "reference test_data checkout not present")
    val sp = spark
    import sp.implicits._
    val patches = Seq(
      ("test/ADV-002", "pkg:npm/foobar", "https://foobar.vcs/", "982f801f",
        "fixed"))
      .toDF("avid", "purl", "vcs_url", "commit_hash", "kind")
    val serialized =
      FederatedExport.serialize(fixtureAdvisories, Some(patches))
        .select("advisory_id", "yaml").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(serialized.keySet == Set("ADV-001", "ADV-002"))
    assert(canon(serialized("ADV-001")) == expectedYml("ADV-001-expected.yml"))
    assert(canon(serialized("ADV-002")) == expectedYml("ADV-002-expected.yml"))
  }

  // ----------------------------------------------- v1 export command
  // test_export.py:100-125 builds one vulnerability
  // (VCID-pst6-b358-aaap: alias CVE-xxx-xxx-xx, a cvssv3_vector
  // severity, CWE-15, one reference) affecting pkg:generic/nginx/test@2
  // and asserts the three YAML files the `export` command writes; the
  // goldens pin the hashid sharding (vcid shard "ps", purl hash "0d")
  // and the v1 document shapes, including the str(None) publication
  // time (export.py:34 `"published_at": str(sev.published_at)`).
  test("captured export_command goldens: v1 vulnerability + package docs") {
    assume(RefCapture.available, "reference test_data checkout not present")
    val sp = spark
    import sp.implicits._
    val vulns = Seq((
      "VCID-pst6-b358-aaap", Seq("CVE-xxx-xxx-xx"), "test-vuln",
      Seq(SeverityRow("cvssv3_vector", "7.0",
        "CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:N/A:H", "https://..")),
      Seq(15),
      Seq(ReferenceRow("https://..", null, "fake"))))
      .toDF("vulnerability_id", "aliases", "summary", "severities",
        "weaknesses", "references")
    val doc = V1Export.vulnerabilityDocs(vulns).collect().head
    assert(doc.getAs[String]("path") ==
      "aboutcode-vulnerabilities/ps/VCID-pst6-b358-aaap.yml")
    val expectedVuln = canon(RefCapture.text(
      "export_command/aboutcode-vulnerabilities/ps/VCID-pst6-b358-aaap.yml"))
    assert(canon(doc.getAs[String]("yaml")) == expectedVuln)

    val pkgs = Seq((
      "generic", "nginx", "test", "pkg:generic/nginx/test@2", 1,
      Seq("VCID-pst6-b358-aaap"), Seq.empty[String]))
      .toDF("ptype", "namespace", "name", "purl", "version_rank",
        "affected_by", "fixing")
    val pdoc = V1Export.packageDocs(pkgs).collect().head
    assert(pdoc.getAs[String]("purls_path") ==
      "aboutcode-packages-generic-0d/generic/nginx/test/purls.yml")
    assert(pdoc.getAs[String]("vulnerabilities_path") ==
      "aboutcode-packages-generic-0d/generic/nginx/test/vulnerabilities.yml")
    assert(canon(pdoc.getAs[String]("purls_yaml")) == canon(RefCapture.text(
      "export_command/aboutcode-packages-generic-0d/generic/nginx/test/purls.yml")))
    assert(canon(pdoc.getAs[String]("vulnerabilities_yaml")) ==
      canon(RefCapture.text(
        "export_command/aboutcode-packages-generic-0d/generic/nginx/test/vulnerabilities.yml")))
  }

  test("tiered purl hash matches the hashid doctest vectors") {
    val sp = spark
    import sp.implicits._
    // hashid get_purl_hash doctests: pypi/univers → "09" (7 bits),
    // pypi/expressionss → "57", pypi/license-expression → "50";
    // Small Ecosystem (cargo) and unlisted types are 0 bits → "0":
    // f"{0:00x}" still emits one digit (int formatting never yields "")
    val rows = Seq(
      ("pkg:pypi/univers", "pypi"),
      ("pkg:pypi/expressionss", "pypi"),
      ("pkg:pypi/license-expression", "pypi"),
      ("pkg:cargo/serde", "cargo"),
      ("pkg:foo/unlisted", "foo"))
      .toDF("core", "ptype")
      .select(V1Export.purlHash(org.apache.spark.sql.functions.col("core"),
        org.apache.spark.sql.functions.col("ptype")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("09", "57", "50", "0", "0"))
  }

  test("captured federate_vulnerabilities golden: package index") {
    assume(RefCapture.available, "reference test_data checkout not present")
    val sp = spark
    import sp.implicits._
    // the unfurled state of the two fixtures at the one concrete
    // version the golden lists: 1.2.4 is affected by ADV-002
    // (vers:npm/>=1.2.4) and fixed by ADV-001 (vers:npm/1.2.4)
    val unfurled = Seq(
      ("test/ADV-002", "pkg:npm/foobar", "1.2.4", true, false),
      ("test/ADV-001", "pkg:npm/foobar", "1.2.4", false, true))
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val doc = FederatedExport.packageIndex(unfurled)
      .select("yaml").collect().head.getString(0)
    assert(canon(doc) == expectedYml("1.2.4/advisories-expected.yml"))
  }

  test("purl2cpe marts assembly: cves+purls+cpes per vulnerability") {
    val sp = spark
    import sp.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def adv(ds: String, id: String, aliases: Seq[String],
        refIds: Seq[String], purl: String) =
      AdvisoryRow(ds, id, "s", aliases,
        refIds.map(r => ReferenceRow(s"https://r/$r", "other", r)),
        Seq.empty[SeverityRow], Seq.empty[Int],
        Seq(AffectedRow(purl, "vers:npm/>=1", "vers:npm/2")),
        ts, None, "https://u", 10)
    // A1+B1 share CVE-2021-1 → one vulnerability pooling both packages'
    // purls and both CPE refs; C1 has packages but no CPE ref → dropped
    // (with_cpes); non-CVE aliases and non-cpe reference ids filter out
    val advisories = AdvisoryDerive.withContentIdAndLatest(Seq(
      adv("a", "A1", Seq("CVE-2021-1"), Seq("cpe:2.3:a:x", "R-1"),
        "pkg:npm/foo"),
      adv("b", "B1", Seq("CVE-2021-1", "CVE-2020-2", "GHSA-x"),
        Seq("cpe:2.3:a:y"), "pkg:npm/bar"),
      adv("c", "C1", Seq("CVE-2019-9"), Seq("R-2"), "pkg:npm/baz"))
      .toDF())
    val versions = Seq(("pkg:npm/foo", "1.5"), ("pkg:npm/bar", "2.0"),
      ("pkg:npm/baz", "1.0")).toDF("base_purl", "version")
    val unfurled = AdvisoryDerive.unfurl(
      AdvisoryDerive.impacts(advisories), versions)
    val member = graft.derive.VulnerabilityV1.membership(sp, advisories)
    val rows = V1Export.purl2cpeFromMarts(member, advisories, unfurled)
      .collect()
    assert(rows.map(_.getAs[String]("cve")).sorted.toSeq ==
      Seq("CVE-2020-2", "CVE-2021-1"))
    val r = rows.find(_.getAs[String]("cve") == "CVE-2021-1").get
    assert(r.getAs[String]("year") == "2021")
    assert(r.getSeq[String](r.fieldIndex("cves")).toList ==
      List("CVE-2020-2", "CVE-2021-1"))
    assert(r.getSeq[String](r.fieldIndex("purls")).toSet ==
      Set("pkg:npm/foo@1.5", "pkg:npm/bar@2.0"))
    assert(r.getSeq[String](r.fieldIndex("cpes")).toList ==
      List("cpe:2.3:a:x", "cpe:2.3:a:y"))
  }
}
