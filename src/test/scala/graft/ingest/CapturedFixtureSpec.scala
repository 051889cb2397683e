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
}
