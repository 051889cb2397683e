package graft.derive

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.operators.SparkTestSession

/** CVE→advisory CVSS3.1 mapping (add_cvss31_to_CVEs.py:25-102): an NVD
  * cvssv3 severity URL on any advisory pulls the cvssv3.1 score of the
  * NVD advisory aliased to that CVE. */
class Cvss31MappingSpec extends AnyFunSuite with SparkTestSession {

  private def adv(ds: String, id: String, aliases: Seq[String],
      sevs: Seq[SeverityRow]): AdvisoryRow =
    AdvisoryRow(ds, id, s"$id summary", aliases, Seq.empty, sevs,
      Seq.empty, Seq.empty, Timestamp.valueOf("2024-01-01 00:00:00"),
      None, s"https://src.example/$id", 100)

  test("NVD cvssv3 severity lands on CVE-aliased advisories as cvssv3.1") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // carrier: gitlab advisory with an NVD cvssv3 severity URL
      adv("gitlab", "GLSA-1", Seq("CVE-2024-1234"), Seq(
        SeverityRow("cvssv3", "7.5", "",
          "https://nvd.nist.gov/vuln/detail/CVE-2024-1234"))),
      // donor: the NVD advisory aliased to that CVE, carrying cvssv3.1
      adv("nvd", "CVE-2024-1234", Seq("CVE-2024-1234"), Seq(
        SeverityRow("cvssv3.1", "9.8",
          "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
          "https://nvd.nist.gov/vuln/detail/CVE-2024-1234"))),
      // carrier with a non-NVD severity URL — never matched
      adv("gitlab", "GLSA-2", Seq("CVE-2024-9999"), Seq(
        SeverityRow("cvssv3", "5.0", "", "https://other.example/x"))),
      // NVD advisory with no cvssv3.1 severity — donates nothing
      adv("nvd", "CVE-2024-7777", Seq("CVE-2024-7777"), Seq(
        SeverityRow("cvssv2", "4.0", "", ""))))
    val advisories = AdvisoryDerive.withContentIdAndLatest(rows.toDF())
    val out = AdvisoryDerive.cveCvss31Severities(advisories).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("avid") == "gitlab/GLSA-1")
    assert(r.getAs[String]("cve_id") == "CVE-2024-1234")
    assert(r.getAs[String]("scoring_system") == "cvssv3.1")
    assert(r.getAs[String]("url") ==
      "https://nvd.nist.gov/vuln/detail/CVE-2024-1234")
    assert(r.getAs[String]("value") == "9.8")
    assert(r.getAs[String]("scoring_elements")
      .startsWith("CVSS:3.1/AV:N"))
  }

  test("registry maps the reference pipeline_id") {
    val (ds, support) =
      graft.ingest.ImporterRegistry.registry("add_cvssv3.1_to_CVEs")
    assert(ds == "nvd")
    assert(support.entryPoint.contains("cveCvss31Severities"))
  }
}
