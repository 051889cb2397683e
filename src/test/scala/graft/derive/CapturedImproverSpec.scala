package graft.derive

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.RefCapture
import graft.operators.SparkTestSession

/** Cross-validation of the improver derivations against the reference's
  * CAPTURED improver fixtures — the derive-side sibling of
  * CapturedFixtureSpec. Five sets:
  *
  *  - default_improver/{nvd,alpine}: input AdvisoryData JSON →
  *    [[Improvers.defaultInferences]] → `*-expected.json`
  *    (test_default_improver.py:112-140);
  *  - debian-oval / ubuntu-oval: `*-oval-expected.json` advisories →
  *    valid-version + default inferences with the reference test's
  *    mocked 1.1.0…1.1.8 version list → `*-oval-improver-expected.json`
  *    (test_debian_oval.py:37-60; the ubuntu set follows the same
  *    recipe — its expected file's version universe is the same mock);
  *  - debian: debian-expected.json advisories → the same improver pair
  *    → debian-improver-expected.json (test_debian.py:35-58).
  *
  * Inferences compare as MULTISETS of canonical projections (the two
  * reference improvers run back-to-back and may emit duplicate rows —
  * order is not meaningful, multiplicity is).
  */
class CapturedImproverSpec extends AnyFunSuite with SparkTestSession {

  private val mapper = new ObjectMapper()

  private def withRef(name: String)(body: => Unit): Unit =
    test(name) {
      assume(RefCapture.available, "reference test_data checkout not present")
      body
    }

  /** The mocked get_package_versions list shared by the oval/debian
    * improver tests (test_debian_oval.py:42-52). */
  private val MockVersions: Seq[String] =
    (0 to 8).map(i => s"1.1.$i")

  // ----------------------------------------------------------- adapters

  private def textOrNull(n: JsonNode, f: String): String = {
    val v = n.get(f)
    if (v == null || v.isNull) null else v.asText()
  }

  /** Qualifiers → the purl-encoded "a=b&c=d" string (sorted by key),
    * accepting both the dict form (inputs) and the pre-encoded string
    * form (v2 expected files). */
  private def qualString(n: JsonNode): String = {
    if (n == null || n.isNull) ""
    else if (n.isTextual) n.asText()
    else n.fieldNames().asScala.toSeq.sorted
      .map(k => s"$k=${n.get(k).asText()}").mkString("&")
  }

  private final case class AdvisoryFacets(
      aliases: Seq[String], summary: String,
      references: Set[(String, String, Set[(String, String)])],
      weaknesses: Set[Int])

  private def refFacets(n: JsonNode): Set[(String, String, Set[(String, String)])] =
    Option(n.get("references")).map(_.elements().asScala.map { r =>
      val sevs = Option(r.get("severities"))
        .map(_.elements().asScala.map(s =>
          (s.get("system").asText(), s.get("value").asText())).toSet)
        .getOrElse(Set.empty)
      (Option(textOrNull(r, "reference_id")).getOrElse(""),
        Option(textOrNull(r, "url")).getOrElse(""), sevs)
    }.toSet).getOrElse(Set.empty)

  /** Parse an AdvisoryData dict into (facets, impact tuples). */
  private def parseAdvisory(n: JsonNode, avid: String):
      (AdvisoryFacets, Seq[(String, String, String, String, String, String, String)]) = {
    val facets = AdvisoryFacets(
      Option(n.get("aliases")).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Seq.empty),
      textOrNull(n, "summary"),
      refFacets(n),
      Option(n.get("weaknesses")).map(_.elements().asScala.map(_.asInt()).toSet)
        .getOrElse(Set.empty))
    val impacts = Option(n.get("affected_packages"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { ap =>
        val p = ap.get("package")
        (avid, p.get("type").asText(),
          Option(textOrNull(p, "namespace")).getOrElse(""),
          p.get("name").asText(), qualString(p.get("qualifiers")),
          textOrNull(ap, "affected_version_range"),
          textOrNull(ap, "fixed_version"))
      }
    (facets, impacts)
  }

  private def loadAdvisories(rel: String):
      (Map[String, AdvisoryFacets],
        Seq[(String, String, String, String, String, String, String)]) = {
    val root = mapper.readTree(RefCapture.text(rel))
    val nodes = if (root.isArray) root.elements().asScala.toSeq else Seq(root)
    val parsed = nodes.zipWithIndex.map { case (n, i) =>
      parseAdvisory(n, s"adv-$i")
    }
    (parsed.zipWithIndex.map { case ((f, _), i) => s"adv-$i" -> f }.toMap,
      parsed.flatMap(_._2))
  }

  // ----------------------------------------------------- canonicalizers

  /** One inference reduced to an order-free canonical projection. */
  private final case class InfCanon(
      aliases: Seq[String], summary: String, confidence: Int,
      affected: Seq[String], fixed: String,
      references: Set[(String, String, Set[(String, String)])],
      weaknesses: Set[Int])

  private def purlCanon(ptype: String, namespace: String, name: String,
      version: String, qualifiers: String): String = {
    val ns = Option(namespace).getOrElse("")
    val q = Option(qualifiers).filter(_.nonEmpty).map("?" + _).getOrElse("")
    s"pkg:$ptype/$ns/$name@$version$q"
  }

  private def purlDictCanon(p: JsonNode): String =
    purlCanon(p.get("type").asText(),
      Option(textOrNull(p, "namespace")).getOrElse(""),
      p.get("name").asText(), textOrNull(p, "version"),
      qualString(p.get("qualifiers")))

  private def expectedCanons(rel: String): Seq[InfCanon] = {
    val root = mapper.readTree(RefCapture.text(rel))
    root.elements().asScala.toSeq.map { n =>
      InfCanon(
        Option(n.get("aliases")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Seq.empty).sorted,
        textOrNull(n, "summary"),
        n.get("confidence").asInt(),
        Option(n.get("affected_purls"))
          .map(_.elements().asScala.map(purlDictCanon).toSeq.sorted)
          .getOrElse(Seq.empty),
        Option(n.get("fixed_purl")).filterNot(_.isNull)
          .map(purlDictCanon).orNull,
        refFacets(n),
        Option(n.get("weaknesses")).map(_.elements().asScala.map(_.asInt()).toSet)
          .getOrElse(Set.empty))
    }
  }

  private def gotCanons(inferences: DataFrame,
      facets: Map[String, AdvisoryFacets]): Seq[InfCanon] =
    inferences.collect().toSeq.map { r =>
      val avid = r.getAs[String]("avid")
      val f = facets(avid)
      val ptype = r.getAs[String]("ptype")
      val ns = r.getAs[String]("namespace")
      val name = r.getAs[String]("name")
      val quals = r.getAs[String]("qualifiers")
      val affected = Option(r.getAs[scala.collection.Seq[String]](
        "affected_versions")).map(_.toSeq).getOrElse(Seq.empty)
        .map(v => purlCanon(ptype, ns, name, v, quals)).sorted
      val fixed = Option(r.getAs[String]("fixed_version"))
        .map(v => purlCanon(ptype, ns, name, v, quals)).orNull
      InfCanon(f.aliases.sorted, f.summary,
        r.getAs[Int]("confidence"), affected, fixed, f.references,
        f.weaknesses)
    }

  private def assertSame(source: String, got: Seq[InfCanon],
      want: Seq[InfCanon]): Unit = {
    val gotSorted = got.sortBy(_.toString)
    val wantSorted = want.sortBy(_.toString)
    if (gotSorted != wantSorted) {
      val missing = wantSorted.diff(gotSorted)
      val extra = gotSorted.diff(wantSorted)
      fail(s"$source: ${got.size} got vs ${want.size} want\n" +
        s"missing (${missing.size}): ${missing.take(3).mkString("\n  ")}\n" +
        s"extra (${extra.size}): ${extra.take(3).mkString("\n  ")}")
    }
  }

  // ------------------------------------------------------------- builders

  private def impactsDf(
      rows: Seq[(String, String, String, String, String, String, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("avid", "ptype", "namespace", "name", "qualifiers",
      "affecting_vers", "fixed_version")
  }

  private def advisoriesDf(facets: Map[String, AdvisoryFacets]): DataFrame = {
    val sp = spark
    import sp.implicits._
    facets.keys.toSeq.toDF("avid")
  }

  private def mockVersionsDf(
      impacts: Seq[(String, String, String, String, String, String, String)],
      versions: Seq[String]): DataFrame = {
    val sp = spark
    import sp.implicits._
    impacts.map(i => (i._2, i._3, i._4)).distinct
      .flatMap { case (t, n, nm) => versions.map((t, n, nm, _)) }
      .toDF("ptype", "namespace", "name", "version")
  }

  // ---------------------------------------------------------------- tests

  private def defaultImproverCase(name: String): Unit = {
    val (facets, impacts) = loadAdvisories(s"default_improver/$name-input.json")
    val got = gotCanons(Improvers.defaultInferences(
      advisoriesDf(facets), impactsDf(impacts)), facets)
    assertSame(name, got, expectedCanons(s"default_improver/$name-expected.json"))
  }

  withRef("default improver: captured nvd advisory matches expected") {
    defaultImproverCase("nvd")
  }

  withRef("default improver: captured alpine advisories match expected") {
    defaultImproverCase("alpine")
  }

  private def validVersionsCase(advisoriesRel: String, expectedRel: String,
      mockVersions: Seq[String] = MockVersions): Unit = {
    val (facets, impacts) = loadAdvisories(advisoriesRel)
    val adf = advisoriesDf(facets)
    val idf = impactsDf(impacts)
    val both = Improvers
      .validVersionInferences(idf, mockVersionsDf(impacts, mockVersions))
      .unionByName(Improvers.defaultInferences(adf, idf))
    assertSame(expectedRel, gotCanons(both, facets),
      expectedCanons(expectedRel))
  }

  withRef("valid-version improver: captured debian-oval advisories match expected") {
    validVersionsCase("debian-oval-expected.json",
      "debian-oval-improver-expected.json")
  }

  withRef("valid-version improver: captured ubuntu-oval advisories match expected") {
    validVersionsCase("ubuntu-oval-expected.json",
      "ubuntu-oval-improver-expected.json")
  }

  withRef("valid-version improver: captured debian tracker advisories match expected") {
    validVersionsCase("debian-expected.json",
      "debian-improver-expected.json")
  }

  // -------- the rest of the ValidVersionImprover fixture family: every
  // reference test follows the same [XImprover, DefaultImprover] recipe
  // over <source>-expected.json with a mocked version list (cited per
  // case). Transcribed mock lists match the reference tests verbatim.

  withRef("valid-version improver: captured elixir advisories match expected") {
    // test_elixir_security.py:40-54
    validVersionsCase("elixir_security/elixir-expected.json",
      "elixir_security/elixir-improver-expected.json",
      Seq("0.1.0", "0.5.6", "0.5.2") ++ MockVersions)
  }

  withRef("valid-version improver: captured ruby advisories match expected") {
    // test_ruby.py:52-63
    validVersionsCase("ruby/parse-advisory-ruby-expected.json",
      "ruby/ruby-improver-expected.json",
      Seq("0.2.6", "1.2.7", "1.3.6", "2.2.1", "3.0.2", "3.0.5"))
  }

  withRef("valid-version improver: captured apache-kafka advisories match expected") {
    // test_apache_kafka.py:42-63
    validVersionsCase("apache_kafka/to-advisory-apache_kafka-expected.json",
      "apache_kafka/apache-kafka-improver-expected.json")
  }

  withRef("valid-version improver: captured istio advisories match expected") {
    // test_istio.py:58-75
    validVersionsCase("istio/istio-expected.json",
      "istio/istio-improver-expected.json")
  }

  withRef("valid-version improver: captured apache-httpd advisory matches expected") {
    // test_apache_httpd.py:125-145 (the improver's ignorable_versions
    // set is disjoint from this mock list, so it cannot bind here)
    validVersionsCase("apache_httpd/CVE-2021-44224-apache-httpd-expected.json",
      "apache_httpd/apache-httpd-improver-expected.json",
      Seq("2.4.8", "2.4.9", "2.4.10", "2.4.53", "2.4.54"))
  }

  withRef("valid-version improver: captured apache-tomcat advisories match expected") {
    // test_apache_tomcat.py:48-70
    validVersionsCase(
      "apache_tomcat/parse-apache_tomcat-selected-advisories-expected.json",
      "apache_tomcat/apache-tomcat-improver-expected.json")
  }

  withRef("valid-version improver: captured npm advisories match expected") {
    // pipelines/test_npm_importer_pipeline.py:54-78 (no 1.1.0!)
    validVersionsCase("npm/parse-advisory-npm-expected.json",
      "npm/npm-improver-expected.json",
      Seq("0.1.0", "0.5.6", "0.5.2", "1.1.1", "1.1.2", "1.1.3", "1.1.4",
        "1.1.5", "1.1.6", "1.1.7", "1.1.8"))
  }

  withRef("nginx improver: captured advisories × git-tag versions match expected") {
    // test_nginx_importer_pipeline.py:219-241: get_inferences_from_versions
    // over improver-advisories.json with the 184 captured git-tag
    // versions; the branch-aware is_vulnerable_nginx_version rule.
    val (facets, impacts) = loadAdvisories("nginx/improver/improver-advisories.json")
    val versions = mapper
      .readTree(RefCapture.text("nginx/improver/improver-versions.json"))
      .elements().asScala.map(_.get("value").asText()).toSeq
    val got = gotCanons(Improvers.nginxInferences(
      impactsDf(impacts), mockVersionsDf(impacts, versions)), facets)
    assertSame("nginx-improver", got,
      expectedCanons("nginx/improver/improver-inferences-expected.json"))
  }

  withRef("status improver: captured MITRE record yields DISPUTED") {
    // test_vulnerability_status_improver.py:56-75: the captured
    // CVE-2023-35866 MITRE record carries tags=["disputed"] → status 2
    val sp = spark
    import sp.implicits._
    val body = RefCapture.text(
      "vulnerability_status_improver/CVE-2023-35866.json")
    val records = Seq(
      ("CVE-2023-35866", body),
      ("CVE-0000-0000", """{"cveMetadata":{"state":"REJECTED"}}"""),
      ("CVE-1111-1111", null.asInstanceOf[String]))
      .toDF("cve_id", "body")
    val got = Improvers.vulnerabilityStatuses(records)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("CVE-2023-35866" -> 2, // DISPUTED
      "CVE-0000-0000" -> 3,                  // INVALID (REJECTED state)
      "CVE-1111-1111" -> 1))                 // unfetchable → PUBLISHED
  }

  // gitlab: one capture per package type, each with its own version
  // universe (pipelines/test_gitlab_importer_pipeline.py:42-78);
  // composer's empty list exercises the no-known-versions branch
  private val GitlabVersions: Map[String, Seq[String]] = Map(
    "maven" -> Seq("1.0.0", "1.0.1", "1.0.2", "2.0.4", "9.0.7", "2.0.5",
      "9.0.6", "9.1.6", "10.0.0"),
    "gem" -> Seq("4.2.0.beta1", "4.2.0.beta2", "4.2.0.beta3"),
    "nuget" -> Seq("1.11.0", "1.11.1", "1.11.2", "1.09.1"),
    "npm" -> Seq("2.14.2", "2.13.2", "2.11.2"),
    "pypi" -> Seq("1.0", "0.9", "0.8", "1.1"),
    "composer" -> Seq.empty)

  for ((ptype, versions) <- GitlabVersions.toSeq.sortBy(_._1))
    withRef(s"valid-version improver: captured gitlab $ptype advisories match expected") {
      validVersionsCase(s"gitlab/$ptype-expected.json",
        s"gitlab/$ptype-improver-expected.json", versions)
    }
}
