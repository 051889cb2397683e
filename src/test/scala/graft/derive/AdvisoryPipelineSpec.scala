package graft.derive

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.OsvIngest
import graft.model.{AdvisoryRow, AffectedRow, ReferenceRow}
import graft.operators.SparkTestSession
import graft.serve.Serving

/** End-to-end advisory pipeline on synthetic OSV fixtures:
  * ingest → content-id/latest → impacts → unfurl → rank → nearest fix →
  * risk → advisory sets → serving. Mirrors the reference's golden-file
  * style (util_tests.py:24-60) with in-code expectations.
  */
class AdvisoryPipelineSpec extends AnyFunSuite with SparkTestSession {

  private def osv(id: String, summary: String, aliases: Seq[String],
      purl: String, ecosystem: String, introduced: String, fixed: String,
      severity: Option[(String, String)] = None,
      modified: String = "2024-01-10T00:00:00Z"): String = {
    val sev = severity.map { case (t, sc) =>
      s""","severity":[{"type":"$t","score":"$sc"}]"""
    }.getOrElse("")
    s"""{"id":"$id","summary":"$summary",
       |"aliases":[${aliases.map("\"" + _ + "\"").mkString(",")}],
       |"modified":"$modified",
       |"affected":[{"package":{"ecosystem":"$ecosystem","name":"x","purl":"$purl"},
       |  "ranges":[{"type":"ECOSYSTEM","events":[
       |    {"introduced":"$introduced"},{"fixed":"$fixed"}]}]}],
       |"references":[{"type":"ADVISORY","url":"https://nvd.nist.gov/vuln/detail/$id"},
       |               {"type":"EXPLOIT","url":"https://exploit.example/$id"}]
       |$sev}""".stripMargin.replaceAll("\n", "")
  }

  private lazy val pipeline = {
    val sp = spark
    import sp.implicits._
    val raw = Seq(
      ("pypa", osv("PYSEC-1", "SQL injection in x", Seq("CVE-2024-100"),
        "pkg:pypi/x", "PyPI", "1.0", "1.4",
        Some("CVSS_V3" -> "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"))),
      // same logical advisory, newer content version (same avid)
      ("pypa", osv("PYSEC-1", "SQL injection in x (updated)",
        Seq("CVE-2024-100"), "pkg:pypi/x", "PyPI", "1.0", "1.4",
        Some("CVSS_V3" -> "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"),
        modified = "2024-02-01T00:00:00Z")),
      // different source, same CVE → same advisory set
      ("ghsa", osv("GHSA-aaaa", "x SQLi", Seq("CVE-2024-100"),
        "pkg:pypi/x", "PyPI", "1.0", "1.4")),
      // unrelated advisory
      ("ghsa", osv("GHSA-bbbb", "other bug", Seq("CVE-2024-200"),
        "pkg:pypi/y", "PyPI", "0", "2.0"))
    ).toDF("datasource_id", "json")
    val advisories = AdvisoryDerive.withContentIdAndLatest(
      OsvIngest.parse(sp, raw).toDF())
    val versionsDim = Seq(
      ("pkg:pypi/x", "0.9"), ("pkg:pypi/x", "1.0"), ("pkg:pypi/x", "1.2"),
      ("pkg:pypi/x", "1.4"), ("pkg:pypi/x", "1.5"),
      ("pkg:pypi/y", "1.0"), ("pkg:pypi/y", "2.0"))
      .toDF("base_purl", "version")
    val impacts = AdvisoryDerive.impacts(advisories)
    val unfurled = AdvisoryDerive.unfurl(impacts, versionsDim).cache()
    val ranked = AdvisoryDerive.versionRank(versionsDim).cache()
    (advisories.cache(), impacts, unfurled, ranked)
  }

  test("ingest parses OSV ranges into vers specs") {
    val (advisories, impacts, _, _) = pipeline
    val row = impacts.filter(col("avid") === "pypa/PYSEC-1").collect().head
    assert(row.getAs[String]("affecting_vers") == "vers:pypi/>=1.0|<1.4")
    assert(row.getAs[String]("fixed_vers") == "vers:pypi/=1.4")
    assert(advisories.count() == 4)
  }

  test("is_latest flags the newest content version per avid (W2)") {
    val (advisories, _, _, _) = pipeline
    val latest = advisories.filter(col("is_latest") &&
      col("avid") === "pypa/PYSEC-1").collect()
    assert(latest.length == 1)
    assert(latest.head.getAs[String]("summary").contains("updated"))
  }

  test("unfurl resolves ranges to concrete versions (V2)") {
    val (_, _, unfurled, _) = pipeline
    val affected = unfurled.filter(col("avid") === "pypa/PYSEC-1" &&
      col("is_affected")).select("version").collect().map(_.getString(0)).sorted
    assert(affected.toSeq == Seq("1.0", "1.2"))
    val fixed = unfurled.filter(col("avid") === "pypa/PYSEC-1" &&
      col("is_fixed")).select("version").collect().map(_.getString(0))
    assert(fixed.toSeq == Seq("1.4"))
  }

  test("nearest fix per affected version (J7)") {
    val (_, _, unfurled, ranked) = pipeline
    val nf = AdvisoryDerive.nearestFix(unfurled, ranked)
      .filter(col("avid") === "pypa/PYSEC-1")
      .collect().map(r => r.getAs[String]("affected_version") ->
        r.getAs[String]("nearest_fixed_version")).toMap
    assert(nf == Map("1.0" -> "1.4", "1.2" -> "1.4"))
  }

  test("risk trio: weighted severity, exploitability, capped risk (A5-A7)") {
    val (advisories, _, _, _) = pipeline
    val risk = AdvisoryDerive.advisoryRisk(advisories)
      .filter(col("avid") === "pypa/PYSEC-1").collect().head
    // v2 OSV severities carry the advisory url (osv_v2.py get_severities
    // is passed the advisory_url): osv.dev is not in the weight table →
    // default weight 0.5 × computed cvss 9.8 → ws 4.9; the exploit
    // reference sets e = 1.0; risk = ws·e = 4.9
    assert(risk.getAs[Double]("weighted_severity") == 4.9)
    assert(risk.getAs[Double]("exploitability") == 1.0)
    assert(risk.getAs[Double]("risk_score") == 4.9)
  }

  test("risk with weight dimension + exploit catalog (A5/A6 full form)") {
    val sp = spark
    import sp.implicits._
    val (advisories, _, _, _) = pipeline
    val weightsDim = Seq(("nvd.nist.gov", 10)).toDF("domain", "weight")
    val exploitAvids = Seq("pypa/PYSEC-1").toDF("avid")
    val risk = AdvisoryDerive.advisoryRiskFull(advisories, weightsDim,
      exploitAvids)
      .filter(col("avid") === "pypa/PYSEC-1").collect().head
    // severity url is the osv.dev advisory page (v2 semantics), not in
    // the weight dimension → default 0.5 × 9.8 → ws 4.9; exploit
    // catalog hit lifts exploitability to 2.0; risk = 4.9 × 2.0 = 9.8
    assert(risk.getAs[Double]("weighted_severity") == 4.9)
    assert(risk.getAs[Double]("exploitability") == 2.0)
    assert(risk.getAs[Double]("risk_score") == 9.8)
  }

  test("advisory sets group by shared alias with precedence primary (D2-D4)") {
    val (advisories, _, _, _) = pipeline
    val sets = AdvisoryDerive.advisorySets(spark, advisories)
      .collect().map(r => r.getAs[String]("avid") ->
        r.getAs[String]("primary_avid")).toMap
    assert(sets("pypa/PYSEC-1") == sets("ghsa/GHSA-aaaa")) // same CVE
    assert(sets("ghsa/GHSA-bbbb") != sets("pypa/PYSEC-1"))
  }

  test("advisory sets: local and distributed paths agree on null aliases") {
    val sp = spark
    import sp.implicits._
    // B carries NULL aliases but its advisory_id is C's alias: both
    // paths must still key B by its advisory_id (the distributed
    // explode(concat(NULL, [id])) bug dropped B's keys entirely)
    val adv = Seq(
      ("ds/A", "A", Seq("CVE-1"), true, 10L),
      ("ds/B", "B", null.asInstanceOf[Seq[String]], true, 5L),
      ("ds/C", "C", Seq("B"), true, 7L),
      ("ds/D", "D", Seq("CVE-1"), true, 3L))
      .toDF("avid", "advisory_id", "aliases", "is_latest", "precedence")
    def groupsOf(df: org.apache.spark.sql.DataFrame) = {
      val m = df.collect().map(r => r.getAs[String]("avid") ->
        (r.getAs[Long]("group_id"), r.getAs[String]("primary_avid"),
          r.getAs[String]("min_alias"))).toMap
      assert(m.size == 4)
      m
    }
    val local = groupsOf(
      AdvisoryDerive.advisorySetsKeyed(sp, adv, 100000))
    val dist = groupsOf(AdvisoryDerive.advisorySetsKeyed(sp, adv, 0))
    assert(local == dist)
    assert(local("ds/B")._1 == local("ds/C")._1)
    assert(local("ds/A")._1 == local("ds/D")._1)
    assert(local("ds/B")._1 != local("ds/A")._1)
  }

  test("advisory sets: null alias ELEMENTS never key a group") {
    val sp = spark
    import sp.implicits._
    // a null INSIDE the aliases array is not a joinable key in the
    // distributed path (SQL equi-join semantics), so the local path
    // must not union on it either — E and F share only the null
    // element and must stay separate — and min_alias must skip nulls
    // like SQL min()
    val adv = Seq(
      ("ds/E", "E", Seq("CVE-9", null), true, 5L),
      ("ds/F", "F", Seq(null.asInstanceOf[String]), true, 4L),
      ("ds/G", "G", Seq("CVE-9"), true, 3L))
      .toDF("avid", "advisory_id", "aliases", "is_latest", "precedence")
    def facts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("avid") ->
        (r.getAs[Long]("group_id"), r.getAs[String]("primary_avid"),
          r.getAs[String]("min_alias"))).toMap
    val local = facts(AdvisoryDerive.advisorySetsKeyed(sp, adv, 100000))
    val dist = facts(AdvisoryDerive.advisorySetsKeyed(sp, adv, 0))
    assert(local == dist)
    assert(local("ds/E")._1 == local("ds/G")._1)  // real shared alias
    assert(local("ds/F")._1 != local("ds/E")._1)  // null is no key
    assert(local("ds/E")._3 == "CVE-9")           // min skips null
    assert(local("ds/F")._3 == null)
  }

  test("advisory sets: primary tie-breaks agree across paths " +
      "(null/MinValue precedence, supplementary-plane avids)") {
    val sp = spark
    import sp.implicits._
    // Group 1: equal precedence, avids differing only in a
    // supplementary-plane character — UTF-16 code-unit order (Java
    // String.compareTo) puts U+10000 (surrogate D800 DC00) BELOW
    // U+FFFD, UTF-8 byte order (Spark binary) puts it ABOVE; the local
    // path must pick the UTF-8 min like the distributed Window does.
    // Group 2: precedence Long.MinValue vs null — the old local
    // negation (-precedence) overflowed MinValue, and null precedence
    // NPE'd Row.getLong; distributed desc puts nulls LAST.
    val supp = "ds/" + new String(Character.toChars(0x10000))
    val repl = "ds/" + "\uFFFD"
    val adv = Seq(
      (supp, "E", Seq("CVE-9"), true, Some(5L)),
      (repl, "F", Seq("CVE-9"), true, Some(5L)),
      ("ds/G", "G", Seq("CVE-8"), true, Some(Long.MinValue)),
      ("ds/H", "H", Seq("CVE-8"), true, Option.empty[Long]))
      .toDF("avid", "advisory_id", "aliases", "is_latest", "precedence")
    def primaries(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("avid") ->
        r.getAs[String]("primary_avid")).toMap
    val local = primaries(AdvisoryDerive.advisorySetsKeyed(sp, adv, 100000))
    val dist = primaries(AdvisoryDerive.advisorySetsKeyed(sp, adv, 0))
    assert(local == dist)
    assert(supp.compareTo(repl) < 0) // UTF-16 disagrees with UTF-8 here
    assert(local(supp) == repl)      // UTF-8 min of the tie
    assert(local("ds/H") == "ds/G")  // MinValue beats null
  }

  test("serving: affecting advisories + bulk lookup + package detail") {
    val sp = spark
    import sp.implicits._
    val (advisories, _, unfurled, ranked) = pipeline
    val aff = Serving.affectingAdvisories(advisories, unfurled,
      "pkg:pypi/x", "1.2").select("avid").collect().map(_.getString(0))
    assert(aff.toSet == Set("pypa/PYSEC-1", "ghsa/GHSA-aaaa"))

    val lookupDf = Serving.bulkLookup(unfurled,
      Seq(("pkg:pypi/x", "1.2"), ("pkg:pypi/x", "1.5"))
        .toDF("base_purl", "version"))
    val lookup = lookupDf
      .collect().map(r => r.getString(1) -> r.getAs[Boolean]("is_vulnerable"))
      .toMap
    assert(lookup == Map("1.2" -> true, "1.5" -> false))
    // Scale guard: every broadcast must be request-bounded — either the
    // raw request list (no aggregate in its subtree) or the hits of a
    // left_semi against the broadcast request list. The round-1 bug
    // (broadcasting the corpus-derived distinct) had a bare HashAggregate
    // under the exchange with no semi join. Traversal descends through
    // AQE wrappers (collect() above finalized the adaptive plan).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec        => Seq(s.plan)
        case other                    => other.children
      }
      p +: inner.flatMap(allNodes)
    }
    val nodes = allNodes(lookupDf.queryExecution.executedPlan)
    val exchanges = nodes.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(exchanges.nonEmpty, "bulkLookup should broadcast the request list")
    exchanges.foreach { b =>
      val sub = allNodes(b)
      val hasSemi = sub.exists {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
        case _ => false
      }
      val corpusFree = !sub.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
      assert(hasSemi || corpusFree,
        s"unbounded broadcast side in bulkLookup plan:\n$b")
    }

    val nf = AdvisoryDerive.nearestFix(unfurled, ranked)
    val detail = Serving.packageDetail(unfurled, ranked, nf)
      .filter(col("base_purl") === "pkg:pypi/x" && col("version") === "1.2")
      .collect().head
    assert(detail.getAs[String]("next_non_vulnerable") == "1.4")
  }

  test("EPSS feed parses and a high-epss donor lifts exploitability (A6)") {
    val sp = spark
    import sp.implicits._
    val (advisories, _, _, _) = pipeline
    val epss = graft.ingest.EpssIngest.fromCsv(sp,
      "src/test/resources/fixtures/epss/epss_scores_sample.csv")
    val rows = epss.collect().map(r => r.getAs[String]("cve") ->
      r.getAs[Double]("score")).toMap
    assert(rows == Map("CVE-2024-100" -> 0.94321, "CVE-2024-200" -> 0.00512,
      "CVE-2024-300" -> 0.81002, "CVE-2024-400" -> 7e-05))
    assert(epss.select("published_at").distinct().collect().head
      .getTimestamp(0) != null)

    val donors = graft.ingest.EpssIngest.donors(epss)
    val weights = Seq.empty[(String, Int)].toDF("domain", "weight")
    val risk = AdvisoryDerive.advisoryRiskWithDonors(advisories, donors, weights)
      .collect().map(r => r.getAs[String]("avid") ->
        (r.getAs[Double]("exploitability"),
          Option(r.getAs[java.lang.Double]("risk_score")))).toMap
    // CVE-2024-100 has epss 0.94 > 0.8 → both advisories carrying that
    // alias jump to the 2.0 tier; ws is 4.9 (default 0.5 weight for the
    // osv.dev severity url × computed cvss 9.8) → risk 4.9 × 2.0 = 9.8
    assert(risk("pypa/PYSEC-1") == (2.0, Some(9.8)))
    assert(risk("ghsa/GHSA-aaaa")._1 == 2.0)
    // CVE-2024-200 scores 0.005 → GHSA-bbbb stays on its exploit-ref tier
    assert(risk("ghsa/GHSA-bbbb")._1 == 1.0)
  }

  test("search cascade: exact alias beats substring (models.py:150-178)") {
    val (advisories, _, _, _) = pipeline
    val exact = Serving.searchAdvisories(advisories, "CVE-2024-200")
      .select("avid").collect().map(_.getString(0))
    assert(exact.toSeq == Seq("ghsa/GHSA-bbbb"))
    // last-resort tier: summary icontains
    val substring = Serving.searchAdvisories(advisories, "sql")
      .select("avid").collect().map(_.getString(0)).toSet
    assert(substring == Set("pypa/PYSEC-1", "ghsa/GHSA-aaaa"))
    // exact advisory_id is the FIRST tier
    val byId = Serving.searchAdvisories(advisories, "GHSA-aaaa")
      .select("avid").collect().map(_.getString(0))
    assert(byId.toSeq == Seq("ghsa/GHSA-aaaa"))
    // id icontains (tier 3) beats the summary tier: 'GHSA' hits both
    // ghsa ids, never the summaries
    val partial = Serving.searchAdvisories(advisories, "ghsa")
      .select("avid").collect().map(_.getString(0)).toSet
    assert(partial == Set("ghsa/GHSA-aaaa", "ghsa/GHSA-bbbb"))
  }

  test("severity relation: donors match by advisory_id OR alias (J11)") {
    val sp = spark
    import sp.implicits._
    val (advisories, _, _, _) = pipeline
    val donors = Seq(
      ("epss/E1", "CVE-2024-100"), // matches two advisories via alias
      ("epss/E2", "GHSA-bbbb"),    // matches by advisory_id
      ("epss/E3", "CVE-9999-1"))   // matches nothing
      .toDF("donor_id", "match_key")
    val related = AdvisoryDerive.relateSeverities(advisories, donors)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(related == Set(
      ("pypa/PYSEC-1", "epss/E1"), ("ghsa/GHSA-aaaa", "epss/E1"),
      ("ghsa/GHSA-bbbb", "epss/E2")))
  }

  test("conflict detection flags disagreeing sources (D7)") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(
      ("s1", osv("A-1", "bug", Seq("CVE-1"), "pkg:pypi/z", "PyPI", "1.0", "2.0")),
      ("s2", osv("B-1", "bug", Seq("CVE-1"), "pkg:pypi/z", "PyPI", "1.0", "3.0"))
    ).toDF("datasource_id", "json")
    val adv = AdvisoryDerive.withContentIdAndLatest(
      OsvIngest.parse(sp, raw).toDF())
    val c = AdvisoryDerive.conflicts(adv).collect()
    assert(c.length == 1)
    assert(c.head.getAs[String]("alias") == "CVE-1")
    // both the ranges (|<2.0 vs |<3.0) and the fixed pins disagree
    assert(c.head.getAs[String]("issue") ==
      "CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES")
    assert(c.head.getAs[String]("advisory_list").split(",").length == 2)
  }

  // ------------------------------------------------------ reference todo
  // semantics, mirroring test_compute_advisory_todo.py:76-200 scenario
  // for scenario (same advisory shapes, same single-issue expectations)
  private def todoAdvisory(id: String, summary: String, aff: String,
      fix: String, alias: Seq[String] = Seq.empty) = {
    AdvisoryRow("ds", id, summary, alias,
      Seq(ReferenceRow("https://example.com/vuln1", null, null)),
      Seq.empty, Seq.empty,
      Seq(AffectedRow("pkg:npm/package1", aff, fix)),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None,
      "https://test.url/", 10)
  }

  test("todo trichotomy + independent missing-summary (compute_advisory_todo)") {
    val sp = spark
    import sp.implicits._
    def todosOf(rows: AdvisoryRow*) =
      AdvisoryDerive.todos(
        AdvisoryDerive.withContentIdAndLatest(rows.toDF()))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // scenario 1: empty summary, complete packages → MISSING_SUMMARY only
    assert(todosOf(todoAdvisory("A1", "",
      "vers:npm/>=1.0.0|<2.0.0", "vers:npm/2.0.0")) ==
      Set(("ds/A1", "MISSING_SUMMARY")))
    // scenario 2: range but no fixed → MISSING_FIXED_BY_PACKAGE
    assert(todosOf(todoAdvisory("A2", "Test summary",
      "vers:npm/>=1.0.0|<2.0.0", "")) ==
      Set(("ds/A2", "MISSING_FIXED_BY_PACKAGE")))
    // scenario 3: fixed but no range → MISSING_AFFECTED_PACKAGE
    assert(todosOf(todoAdvisory("A3", "Test summary",
      "", "vers:npm/2.0.0")) ==
      Set(("ds/A3", "MISSING_AFFECTED_PACKAGE")))
    // neither → the combined issue; with an empty summary BOTH issues
    // coexist (the reference's two checks run independently)
    assert(todosOf(todoAdvisory("A4", "", "", "")) ==
      Set(("ds/A4", "MISSING_SUMMARY"),
        ("ds/A4", "MISSING_AFFECTED_AND_FIXED_BY_PACKAGES")))
  }

  test("conflicting fixed+affected across two advisories of one CVE") {
    val sp = spark
    import sp.implicits._
    val adv = AdvisoryDerive.withContentIdAndLatest(Seq(
      todoAdvisory("T1", "Test summary", "vers:npm/>=1.0.0|<2.0.0",
        "vers:npm/2.0.0", Seq("CVE-0000-0000")),
      todoAdvisory("T2", "Test summary", "vers:npm/>=1.0.0|<=2.0.0",
        "vers:npm/2.0.1", Seq("CVE-0000-0000"))).toDF())
    val c = AdvisoryDerive.conflicts(adv).collect()
    assert(c.length == 1)
    assert(c.head.getAs[String]("alias") == "CVE-0000-0000")
    assert(c.head.getAs[String]("issue") ==
      "CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES")
    assert(c.head.getAs[String]("advisory_list") == "ds/T1,ds/T2")
    // a MISSING_AFFECTED_AND_FIXED_BY_PACKAGES advisory is excluded
    // from the matrix (the reference's queryset .exclude) — its empty
    // sets must NOT create a third opinion
    val withEmpty = AdvisoryDerive.withContentIdAndLatest(Seq(
      todoAdvisory("T1", "Test summary", "vers:npm/>=1.0.0|<2.0.0",
        "vers:npm/2.0.0", Seq("CVE-0000-0000")),
      todoAdvisory("T3", "Test summary", "", "",
        Seq("CVE-0000-0000"))).toDF())
    assert(AdvisoryDerive.conflicts(withEmpty).isEmpty)
    // non-CVE aliases enter the matrix too: the reference iterates
    // cve_aliases THEN non_cve_aliases (compute_advisory_todo.py:
    // 147-164) — `istartswith="cve"` is processing order, not a filter
    val ghsaOnly = AdvisoryDerive.withContentIdAndLatest(Seq(
      todoAdvisory("T1", "Test summary", "vers:npm/>=1.0.0|<2.0.0",
        "vers:npm/2.0.0", Seq("GHSA-xxxx")),
      todoAdvisory("T2", "Test summary", "vers:npm/>=1.0.0|<=2.0.0",
        "vers:npm/2.0.1", Seq("GHSA-xxxx"))).toDF())
    val g = AdvisoryDerive.conflicts(ghsaOnly).collect()
    assert(g.length == 1)
    assert(g.head.getAs[String]("alias") == "GHSA-xxxx")
    // related advisories come only from purls with an actual
    // disagreement (:985-1001 — update runs after the continue)
    val mixed = AdvisoryDerive.withContentIdAndLatest(Seq(
      // purl package1 disagrees between T1/T2; package2 agrees T1/T3
      AdvisoryRow("ds", "T1", "Test summary", Seq("CVE-0000-0001"),
        Seq(ReferenceRow("https://example.com/vuln1", null, null)),
        Seq.empty, Seq.empty,
        Seq(AffectedRow("pkg:npm/package1", "vers:npm/>=1.0.0|<2.0.0",
          "vers:npm/2.0.0"),
          AffectedRow("pkg:npm/package2", "vers:npm/>=1.0.0|<3.0.0",
            "vers:npm/3.0.0")),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None,
        "https://test.url/", 10),
      todoAdvisory("T2", "Test summary", "vers:npm/>=1.0.0|<=2.0.0",
        "vers:npm/2.0.1", Seq("CVE-0000-0001")),
      AdvisoryRow("ds", "T3", "Test summary", Seq("CVE-0000-0001"),
        Seq(ReferenceRow("https://example.com/vuln1", null, null)),
        Seq.empty, Seq.empty,
        Seq(AffectedRow("pkg:npm/package2", "vers:npm/>=1.0.0|<3.0.0",
          "vers:npm/3.0.0")),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None,
        "https://test.url/", 10)).toDF())
    val m = AdvisoryDerive.conflicts(mixed).collect()
    assert(m.length == 1)
    // T3 only shares the AGREEING purl package2 → not related
    assert(m.head.getAs[String]("advisory_list") == "ds/T1,ds/T2")
  }
}
