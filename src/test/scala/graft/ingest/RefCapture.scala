package graft.ingest

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.AdvisoryRow

/** Cross-validation harness against the reference's CAPTURED upstream
  * fixtures (`vulnerabilities/tests/test_data/<source>` — real payloads
  * snapshotted from each advisory feed, with the reference pipeline's
  * expected `AdvisoryData`/`AdvisoryDataV2` output alongside, e.g.
  * `gentoo_v2/glsa-201709-09.xml` + `glsa-201709-09-expected.json`).
  *
  * Both sides are reduced to a [[Canon]] — a canonical, order-free
  * projection of the fields the two models share — and compared facet by
  * facet. Canonicalization rules (all semantics-preserving):
  *   - vers ranges compare as constraint SETS with the redundant `=` pin
  *     prefix dropped (univers normalizes `=1.2.3` to `1.2.3`; constraint
  *     order inside a vers string is not meaningful);
  *   - affected packages aggregate by purl: the reference's V2 output
  *     splits one package's ranges across several AffectedPackageV2
  *     entries (affected XOR fixed populated), our AffectedRow keeps both
  *     on one row — the per-purl (affected, fixed) constraint-set pair is
  *     the common denominator;
  *   - references compare as (reference_id, url) pairs — the reference's
  *     V2 ReferenceV2 carries no type, ours does;
  *   - severities compare as (system, value, scoring_elements) triples —
  *     ours additionally carries a context url, the reference's does not;
  *   - timestamps compare as instants (both sides render UTC ISO-8601).
  */
object RefCapture {

  val root: Path = Paths.get(sys.env.getOrElse("GRAFT_REF_TESTDATA",
    "/root/reference/vulnerabilities/tests/test_data"))

  def available: Boolean = Files.isDirectory(root)

  def text(rel: String): String = Files.readString(root.resolve(rel))

  private val mapper = new ObjectMapper()

  /** Canonical advisory projection shared by AdvisoryRow and the
    * reference's expected-JSON dumps. */
  final case class Canon(
      id: String, // advisory_id; "" in v1-format expected files
      aliases: Set[String],
      summary: String,
      // purl -> (affected constraint set, fixed constraint set)
      packages: Map[String, (Set[String], Set[String])],
      references: Set[(String, String)], // (reference_id, url)
      patches: Set[String], // patch urls (V2 PatchData; our type=patch refs)
      // ("introduced"|"fixed", commit hash) — V2 per-package commit
      // patches; our directed vulnerable_commit/fix_commit references
      commits: Set[(String, String)],
      severities: Set[(String, String, String)], // (system, value, elements)
      weaknesses: Set[Int],
      datePublished: Option[String], // ISO instant
      url: String)

  /** `vers:scheme/c1|c2` → order-free constraint set, `=` pins bared. */
  def canonVers(vers: String): Set[String] = {
    val body = vers.indexOf('/') match {
      case -1 => vers
      case i  => vers.substring(i + 1)
    }
    body.split('|').iterator.map(_.trim).filter(_.nonEmpty)
      .map(c => if (c.startsWith("=") && !c.startsWith("==")) c.drop(1) else c)
      .toSet
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull).toSeq
      .flatMap(_.elements().asScala)

  /** Reassemble a purl string from the expected file's exploded
    * PackageURL dict (same shape to_string produces). */
  private def purlOf(p: JsonNode): String = {
    // expected JSONs carry DECODED fields; render through the codec so
    // both sides of every compare use the same canonical encoding
    val quals = optText(p, "qualifiers").filter(_.nonEmpty)
      .map(_.split('&').toSeq.filter(_.contains("="))
        .map { kv =>
          val i = kv.indexOf('=')
          kv.substring(0, i).toLowerCase -> kv.substring(i + 1)
        }.filter(_._2.nonEmpty).toMap)
      .getOrElse(Map.empty[String, String])
    graft.functions.PurlCodec.Purl(
      p.get("type").asText,
      optText(p, "namespace").getOrElse(""),
      p.get("name").asText,
      optText(p, "version").getOrElse(""),
      quals,
      optText(p, "subpath").getOrElse("")).format
  }

  private def canonInstant(s: String): String =
    try java.time.OffsetDateTime.parse(s).toInstant.toString
    catch {
      case _: java.time.format.DateTimeParseException =>
        // offset-less captures ("2017-08-02T00:00:00") are UTC
        java.time.LocalDateTime.parse(s)
          .toInstant(java.time.ZoneOffset.UTC).toString
    }

  /** One expected-JSON advisory (v1 or v2 format) → Canon. */
  def canonExpected(n: JsonNode): Canon = {
    val packages = arr(n, "affected_packages").foldLeft(
      Map.empty[String, (Set[String], Set[String])]) { (acc, ap) =>
      val purl = purlOf(ap.get("package"))
      val aff = optText(ap, "affected_version_range")
        .map(canonVers).getOrElse(Set.empty)
      // v2 files carry fixed_version_range (vers), v1 a bare fixed_version
      val fix = optText(ap, "fixed_version_range").map(canonVers)
        .orElse(optText(ap, "fixed_version").filter(_.nonEmpty)
          .map(v => Set(v)))
        .getOrElse(Set.empty)
      val (a0, f0) = acc.getOrElse(purl, (Set.empty[String], Set.empty[String]))
      acc.updated(purl, (a0 ++ aff, f0 ++ fix))
    }
    // v1 format nests severities under references; v2 has them top-level
    val refSevs = for {
      r <- arr(n, "references")
      s <- arr(r, "severities")
    } yield (s.get("system").asText, s.get("value").asText,
      optText(s, "scoring_elements").getOrElse(""))
    val topSevs = arr(n, "severities").map(s =>
      (s.get("system").asText, s.get("value").asText,
        optText(s, "scoring_elements").getOrElse("")))
    Canon(
      id = optText(n, "advisory_id").getOrElse(""),
      aliases = arr(n, "aliases").map(_.asText).toSet,
      summary = optText(n, "summary").getOrElse(""),
      packages = packages,
      references = arr(n, "references")
        .map(r => (optText(r, "reference_id").getOrElse(""),
          r.get("url").asText)).toSet,
      patches = arr(n, "patches")
        .flatMap(p => optText(p, "patch_url")).toSet,
      commits = arr(n, "affected_packages").flatMap { ap =>
        arr(ap, "introduced_by_commit_patches")
          .flatMap(optText(_, "commit_hash")).map(("introduced", _)) ++
          arr(ap, "fixed_by_commit_patches")
            .flatMap(optText(_, "commit_hash")).map(("fixed", _))
      }.toSet,
      severities = (refSevs ++ topSevs).toSet,
      weaknesses = arr(n, "weaknesses").map(_.asInt).toSet,
      datePublished = optText(n, "date_published").map(canonInstant),
      url = optText(n, "url").getOrElse(""))
  }

  /** Load an expected file (either one advisory object or an array). */
  def loadExpected(rel: String): Seq[Canon] = {
    val node = mapper.readTree(text(rel))
    val items = if (node.isArray) node.elements().asScala.toSeq else Seq(node)
    items.map(canonExpected)
  }

  /** Our parser output → the same canonical projection. */
  def canonRow(row: AdvisoryRow): Canon = {
    val packages = row.affected.foldLeft(
      Map.empty[String, (Set[String], Set[String])]) { (acc, ap) =>
      val (a0, f0) = acc.getOrElse(ap.purl,
        (Set.empty[String], Set.empty[String]))
      acc.updated(ap.purl,
        (a0 ++ canonVers(ap.affecting_vers), f0 ++ canonVers(ap.fixed_vers)))
    }
    Canon(
      id = row.advisory_id,
      aliases = row.aliases.toSet,
      summary = row.summary,
      packages = packages,
      references = row.references.filterNot(r =>
        Set("patch", "vulnerable_commit", "fix_commit")(r.reference_type))
        .map(r => (Option(r.reference_id).getOrElse(""), r.url)).toSet,
      patches = row.references.filter(_.reference_type == "patch")
        .map(_.url).toSet,
      commits = row.references.collect {
        case r if r.reference_type == "vulnerable_commit" =>
          ("introduced", r.reference_id)
        case r if r.reference_type == "fix_commit" =>
          ("fixed", r.reference_id)
      }.toSet,
      severities = row.severities.map(s =>
        (s.scoring_system, Option(s.value).getOrElse(""),
          Option(s.scoring_elements).getOrElse(""))).toSet,
      weaknesses = row.weaknesses.toSet,
      datePublished = row.date_published.map(_.toInstant.toString),
      url = row.url)
  }

  /** Facet names, used for per-source documented exclusions. */
  val AllFacets: Set[String] = Set("aliases", "summary", "packages",
    "references", "patches", "severities", "weaknesses", "datePublished",
    "url")

  /** Align two canon sets by key and assert facet equality; `skip` names
    * facets with a documented intentional divergence for the source. */
  def assertMatch(source: String, got: Seq[Canon], want: Seq[Canon],
      skip: Set[String] = Set.empty,
      key: Canon => String = c => c.id): Unit = {
    val gotBy = got.groupBy(key)
    val wantBy = want.groupBy(key)
    val missing = wantBy.keySet -- gotBy.keySet
    val extra = gotBy.keySet -- wantBy.keySet
    assert(missing.isEmpty && extra.isEmpty,
      s"$source advisory sets differ — missing=${missing.toSeq.sorted.take(8)}"
        + s" extra=${extra.toSeq.sorted.take(8)}"
        + s" gotKeys=${gotBy.keySet.toSeq.sorted.take(8)}")
    for (k <- wantBy.keySet.toSeq.sorted) {
      assert(gotBy(k).size == 1 && wantBy(k).size == 1,
        s"$source[$k]: duplicate canonical key (got ${gotBy(k).size}," +
          s" want ${wantBy(k).size}) — refine the key function")
      val g = gotBy(k).head
      val w = wantBy(k).head
      def facet(name: String, a: Any, b: Any): Unit =
        if (!skip.contains(name))
          assert(a == b, s"$source[$k] $name differs:\n  ours=$a\n  ref =$b")
      facet("aliases", g.aliases, w.aliases)
      facet("summary", g.summary, w.summary)
      facet("packages", g.packages, w.packages)
      facet("references", g.references, w.references)
      facet("patches", g.patches, w.patches)
      facet("commits", g.commits, w.commits)
      facet("severities", g.severities, w.severities)
      facet("weaknesses", g.weaknesses, w.weaknesses)
      facet("datePublished", g.datePublished, w.datePublished)
      facet("url", g.url, w.url)
    }
  }
}
