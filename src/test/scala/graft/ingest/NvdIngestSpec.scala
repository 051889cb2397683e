package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

class NvdIngestSpec extends AnyFunSuite with SparkTestSession {
  private val item =
    """{"cve": {"id": "CVE-2024-12345", "published": "2024-03-01T10:00:00.000",
      |"lastModified": "2024-03-05T10:00:00.000",
      |"descriptions": [{"lang": "es", "value": "malo"},
      |                 {"lang": "en", "value": "A bad bug in widget"}],
      |"metrics": {"cvssMetricV31": [{"cvssData": {"baseScore": 9.8,
      |  "version": "3.1",
      |  "vectorString": "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"}}]},
      |"references": [{"url": "https://vendor.example/advisory",
      |                "tags": ["Vendor Advisory"]},
      |               {"url": "https://exploit.example/poc", "tags": ["Exploit"]}],
      |"configurations": [{"nodes": [{"cpeMatch": [
      |  {"criteria": "cpe:2.3:a:acme:widget:1.0:*:*:*:*:*:*:*", "vulnerable": true},
      |  {"criteria": "cpe:2.3:a:acme:widget:2.0:*:*:*:*:*:*:*", "vulnerable": false}
      |]}]}]}}""".stripMargin.replaceAll("\n", "")

  test("NVD CVE item parses to AdvisoryRow (S2)") {
    val sp = spark
    import sp.implicits._
    val rows = NvdIngest.parse(sp,
      Seq(("nvd", item)).toDF("datasource_id", "json")).collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.advisory_id == "CVE-2024-12345")
    assert(a.summary == "A bad bug in widget")   // english description
    // the CVE id is the advisory id, never a self-alias
    // (nvd_importer.py:313)
    assert(a.aliases.isEmpty)
    assert(a.severities.head.scoring_system == "cvssv3.1")
    assert(a.severities.head.value == "9.8")
    assert(a.references.map(_.reference_type).toSet ==
      Set("advisory", "exploit", "other"))
    // EVERY CPE criteria is tracked (vulnerable or not,
    // nvd_importer.py:195-202), each with its NVD-search url
    assert(a.references.count(_.reference_id.startsWith("cpe:")) == 2)
    assert(a.references.filter(_.reference_id.startsWith("cpe:"))
      .forall(_.url.contains("isCpeNameSearch=true")))
    // the CVE proper is a reference (nvd_importer.py:265-271)
    assert(a.references.exists(r => r.reference_id == "CVE-2024-12345" &&
      r.url == "https://nvd.nist.gov/vuln/detail/CVE-2024-12345"))
    assert(a.precedence == 10)
  }
}
