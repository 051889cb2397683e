package graft.derive

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.operators.SparkTestSession

/** The remaining derive-side reference pipelines: summary back-fill
  * (populate_vulnerability_summary_pipeline.py:21-71), ghost packages
  * (flag_ghost_packages.py:35-90), all-impacts-unfurled marking
  * (mark_unfurl_version_range.py:79-124). */
class DerivePipelinesSpec extends AnyFunSuite with SparkTestSession {

  private def adv(ds: String, id: String, summary: String,
      aliases: Seq[String], collected: String): AdvisoryRow =
    AdvisoryRow(ds, id, summary, aliases, Seq.empty, Seq.empty,
      Seq.empty, Seq.empty, Timestamp.valueOf(collected), None,
      s"https://src.example/$id", 100)

  test("summary backfill: best non-empty NVD donor per CVE alias (D9)") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      adv("gitlab", "GLSA-1", "", Seq("CVE-2024-1"), "2024-01-01 00:00:00"),
      // two NVD donors for the CVE — the later-collected one wins
      adv("nvd", "CVE-2024-1", "older text", Seq("CVE-2024-1"),
        "2024-01-01 00:00:00"),
      adv("nvd", "CVE-2024-1b", "newer text", Seq("CVE-2024-1"),
        "2024-02-01 00:00:00"),
      // blank advisory with a non-CVE alias only — skipped
      adv("gitlab", "GLSA-2", "", Seq("GHSA-xxxx"), "2024-01-01 00:00:00"),
      // blank NVD donor — excluded from donation
      adv("nvd", "CVE-2024-2", "", Seq("CVE-2024-2"), "2024-01-01 00:00:00"),
      adv("gitlab", "GLSA-3", "", Seq("CVE-2024-2"), "2024-01-01 00:00:00"),
      // advisory that already has a summary — untouched
      adv("gitlab", "GLSA-4", "has one", Seq("CVE-2024-1"),
        "2024-01-01 00:00:00"))
    val advisories = AdvisoryDerive.withContentIdAndLatest(rows.toDF())
    val got = AdvisoryDerive.backfillSummaries(advisories)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("gitlab/GLSA-1" -> "newer text"))
  }

  test("backfill picks the LATEST-collected donor across multiple aliases") {
    val sp = spark
    import sp.implicits._
    // the blank advisory carries two CVE aliases; CVE-B's donor is newer
    // but its text sorts LAST alphabetically — a lexicographic min would
    // wrongly return CVE-A's stale text
    val rows = Seq(
      adv("gitlab", "GLSA-9", "", Seq("CVE-2024-A", "CVE-2024-B"),
        "2024-01-01 00:00:00"),
      adv("nvd", "CVE-2024-A", "apple parsing bug", Seq("CVE-2024-A"),
        "2020-01-01 00:00:00"),
      adv("nvd", "CVE-2024-B", "zebra overflow", Seq("CVE-2024-B"),
        "2024-06-01 00:00:00"))
    val advisories = AdvisoryDerive.withContentIdAndLatest(rows.toDF())
    val got = AdvisoryDerive.backfillSummaries(advisories)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("gitlab/GLSA-9" -> "zebra overflow"))
  }

  test("ghost packages: pinned versions missing upstream (D8)") {
    val sp = spark
    import sp.implicits._
    val impacts = Seq(
      ("a/1", "pkg:pypi/x", "vers:pypi/1.0|2.0"),
      ("a/2", "pkg:pypi/y", "vers:pypi/9.9"))
      .toDF("avid", "base_purl", "affecting_vers")
    val dim = Seq(("pkg:pypi/x", "1.0"), ("pkg:pypi/y", "1.0"))
      .toDF("base_purl", "version")
    val ghosts = AdvisoryDerive.ghostPackages(impacts, dim)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // x@2.0 and y@9.9 are claimed but unknown upstream; x@1.0 exists
    assert(ghosts == Set(("pkg:pypi/x", "2.0"), ("pkg:pypi/y", "9.9")))
  }

  test("all-impacts-unfurled marks (mark_unfurl_version_range_v2)") {
    val sp = spark
    import sp.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val impacts = Seq(
      // both impacts attempted + successful
      ("a/1", Some(t0), Some(t0)), ("a/1", Some(t0), Some(t0)),
      // attempted but one unsuccessful
      ("a/2", Some(t0), Some(t0)), ("a/2", Some(t0), None),
      // one impact never attempted
      ("a/3", Some(t0), Some(t0)), ("a/3", None, None))
      .toDF("avid", "last_range_unfurl_at", "last_successful_range_unfurl_at")
    val got = AdvisoryDerive.allImpactsUnfurled(impacts)
      .collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got("a/1") == (true, true))
    assert(got("a/2") == (true, false))
    assert(got("a/3") == (false, false))
  }
}
