package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

class ServingExtraSpec extends AnyFunSuite with SparkTestSession {

  private def advisories = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("a/1", true, Seq(("cpe:2.3:a:nginx", "other"), ("ADV-1", "advisory"))),
      ("a/2", true, Seq(("DSA-1", "advisory"))),
      ("a/3", false, Seq(("cpe:2.3:a:nginx", "other"))))
      .toDF("avid", "is_latest", "refs")
      .withColumn("references", expr(
        "transform(refs, r -> struct(r._1 AS reference_id, r._2 AS reference_type, '' AS url))"))
  }

  test("byReferenceId: CPE lookup honors is_latest (J14)") {
    val got = Serving.byReferenceId(advisories, Seq("cpe:2.3:a:nginx"))
      .select("avid").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a/1"))
  }

  test("searchPackages purl-heuristic cascade (models.py:746-764)") {
    val sp = spark
    import sp.implicits._
    val pkgs = Seq(
      "pkg:npm/lodash@4.17.0", "pkg:npm/lodash@4.17.21",
      "pkg:npm/express@4.0.0", "pkg:pypi/django@3.2")
      .toDF("package_url")
    def search(q: String) = Serving.searchPackages(pkgs, q)
      .collect().map(_.getString(0)).toSeq
    // fielded purl with qualifiers: normalized through the codec first
    // (qualifiers stripped, version kept), then istartswith
    assert(search("pkg:npm/lodash@4.17.0?arch=x64&os=linux") ==
      Seq("pkg:npm/lodash@4.17.0"))
    // version-less purl prefix-matches every version
    assert(search("pkg:NPM/Lodash") ==
      Seq("pkg:npm/lodash@4.17.0", "pkg:npm/lodash@4.17.21"))
    // non-purl query falls back to icontains
    assert(search("LODASH") ==
      Seq("pkg:npm/lodash@4.17.0", "pkg:npm/lodash@4.17.21"))
    assert(search("") == Seq.empty)
    // ordered by package_url like the reference queryset
    assert(search("pkg:npm/") == Seq("pkg:npm/express@4.0.0",
      "pkg:npm/lodash@4.17.0", "pkg:npm/lodash@4.17.21"))
  }

  test("reference archive state machine (archive_urls.py:28-60)") {
    val sp = spark
    import sp.implicits._
    val refs = Seq(
      ("https://a.example/1", null.asInstanceOf[String]),   // pending
      ("https://a.example/2", null.asInstanceOf[String]),   // pending
      ("https://a.example/3", "NO_ARCHIVE"),                // attempted
      ("https://a.example/4", "https://web.archive.example/4"), // done
      ("ftp://a.example/5", null.asInstanceOf[String]))     // non-http
      .toDF("url", "archive_url")
    val pending = graft.derive.ReferenceArchive.pendingArchive(refs)
      .select("url").collect().map(_.getString(0)).toSet
    // NO_ARCHIVE and already-archived rows are excluded; non-http urls
    // are skipped by the improver loop
    assert(pending == Set("https://a.example/1", "https://a.example/2"))
    // fetch round: /1 found an archive, /2 found nothing -> NO_ARCHIVE;
    // /3 and /4 keep their state, the unattempted non-http row stays null
    val fetched = Seq(
      ("https://a.example/1", "https://web.archive.example/1"),
      ("https://a.example/2", null.asInstanceOf[String]))
      .toDF("url", "archive_url")
    val after = graft.derive.ReferenceArchive
      .applyArchiveResults(refs, fetched)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("https://a.example/1") == "https://web.archive.example/1")
    assert(after("https://a.example/2") == "NO_ARCHIVE")
    assert(after("https://a.example/3") == "NO_ARCHIVE")
    assert(after("https://a.example/4") == "https://web.archive.example/4")
    assert(after("ftp://a.example/5") == null)
  }

  test("latest-affecting/fixed-by/both queryset variants (S9)") {
    val sp = spark
    import sp.implicits._
    val advs = Seq(
      ("src/A", "ds1", true), ("src/B", "ds1", true), ("src/C", "ds2", true),
      ("src/A-old", "ds1", false))
      .toDF("avid", "datasource_id", "is_latest")
    // unfurled rows only exist for latest advisories (impacts() filters
    // is_latest), mirroring the reference's is_latest + unfurled-at guard
    val unfurled = Seq(
      ("src/A", "pkg:npm/x", "1.0", true, false),
      ("src/A", "pkg:npm/x", "2.0", false, true),
      ("src/B", "pkg:npm/x", "2.0", true, false),
      ("src/C", "pkg:npm/y", "1.0", true, false))
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val req = Seq(("pkg:npm/x", "2.0")).toDF("base_purl", "version")

    def avids(mode: String) =
      Serving.advisoriesForPurls(advs, unfurled, req, mode)
        .select("avid").collect().map(_.getString(0)).toSet
    // x@2.0: B affects it, A fixes by it, C unrelated
    assert(avids("affecting") == Set("src/B"))
    assert(avids("fixed") == Set("src/A"))
    assert(avids("both") == Set("src/A", "src/B"))

    val pairs = Serving.advisoryPurlPairs(unfurled, req, "both")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("pkg:npm/x@2.0", "src/A"), ("pkg:npm/x@2.0", "src/B")))

    val kept = Serving.todoExcluded(advs,
      Seq("ds2").toDF("datasource_id"))
      .select("avid").collect().map(_.getString(0)).toSet
    assert(kept == Set("src/A", "src/B", "src/A-old"))
  }

  test("packageTypes distinct directory (api_v3.py:342-353)") {
    val sp = spark
    import sp.implicits._
    val pkgs = Seq("npm", "pypi", "npm", "deb", "pypi")
      .toDF("type").withColumn("extra", lit(1))
    val got = Serving.packageTypes(pkgs).collect().map(_.getString(0)).toSeq
    assert(got == Seq("deb", "npm", "pypi"))
  }

  test("fixedPackageDetails flags is_vulnerable and drops ghosts (views.py:438-478)") {
    val sp = spark
    import sp.implicits._
    val unfurled = Seq(
      // A fixes x@2.0, but B affects x@2.0 -> is_vulnerable=true
      ("src/A", "pkg:npm/x", "2.0", false, true),
      ("src/B", "pkg:npm/x", "2.0", true, false),
      // A fixes x@3.0, nothing affects it -> is_vulnerable=false
      ("src/A", "pkg:npm/x", "3.0", false, true),
      // C fixes y@1.0, but y@1.0 is a ghost -> excluded
      ("src/C", "pkg:npm/y", "1.0", false, true))
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val ghosts = Seq(("pkg:npm/y", "1.0")).toDF("base_purl", "version")
    val got = Serving.fixedPackageDetails(unfurled, ghosts)
      .collect()
      .map(r => (r.getAs[String]("avid"), r.getAs[String]("base_purl"),
        r.getAs[String]("version"), r.getAs[Boolean]("is_vulnerable")))
      .toSet
    assert(got == Set(
      ("src/A", "pkg:npm/x", "2.0", true),
      ("src/A", "pkg:npm/x", "3.0", false)))
  }

  test("fixedByPackagePurls sorted distinct non-null (api_v3.py:355-365)") {
    val sp = spark
    import sp.implicits._
    val unfurled = Seq(
      ("src/A", "pkg:npm/x", "2.0", false, true),
      ("src/A", "pkg:npm/x", "2.0", false, true), // duplicate collapses
      ("src/A", "pkg:npm/a", "1.0", false, true),
      ("src/A", "pkg:npm/z", null.asInstanceOf[String], false, true), // null dropped
      ("src/A", "pkg:npm/w", "9.0", true, false)) // affected, not fixed
      .toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val got = Serving.fixedByPackagePurls(unfurled)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(got("src/A") == Seq("pkg:npm/a@1.0", "pkg:npm/x@2.0"))
  }

  test("keyed pagination is stable and O(page) (W6)") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 25).map(i => f"id$i%03d").toDF("id")
    val p1 = Serving.pageAfter(df, "id", None, 10)
      .collect().map(_.getString(0))
    val p2 = Serving.pageAfter(df, "id", Some(p1.last), 10)
      .collect().map(_.getString(0))
    assert(p1.length == 10 && p2.length == 10)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert(p2.head > p1.last)
  }
}
