package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Cvss, Cvss4}
import graft.model._

/** OSV-format advisory ingestion (SURVEY S1/S4).
  *
  * PyPA/PySec/GitHub-OSV/OSS-Fuzz/Ubuntu all share this format; the
  * semantics follow the reference's shared v2 parser
  * (pipes/osv_v2.py:61-507), cross-validated against its captured
  * fixtures (tests/test_data/osv_test/{pypa,github,oss-fuzz}):
  *
  *   - the explicit `versions` pin list WINS over event-derived ranges
  *     (osv_v2.py:175-177 `explicit or last_known or derived`);
  *   - `database_specific.last_known_affected_version_range` is the
  *     second choice, translated from the GitHub constraint grammar;
  *   - ECOSYSTEM/SEMVER range events build constraints: introduced→`>=`
  *     (`introduced: "0"` contributes NOTHING), fixed→`<` affected plus
  *     `=` fixed, last_affected→`<=`;
  *   - GIT ranges never produce version constraints — their events are
  *     commits: on a supported VCS host they become directed
  *     vulnerable_commit/fix_commit references (our flat analog of
  *     AffectedPackageV2.*_commit_patches), elsewhere plain `commit`
  *     references (advisory.py:206-250 classify_patch_source);
  *   - CVSS_V3/V4 severity values are COMPUTED from the vector
  *     (severity_systems compute), CVSS_V2 entries are dropped (the
  *     `cvss_v2` type is unmapped in the reference, osv_v2.py:54-58),
  *     ecosystem_specific/database_specific severities are
  *     generic_textual;
  *   - weaknesses come from `database_specific.cwe_ids`; the advisory id
  *     is removed from aliases.
  *
  * The parse runs as one snakeyaml instance per partition inside a
  * mapPartitions over the file scan (OSV ships both JSON and YAML — JSON
  * is a YAML subset), the same per-file shape the reference runs, with
  * no shuffle: a map-only distributed scan.
  */
object OsvIngest {

  /** OSV ecosystem → purl type (osv_v2.py:42-52 + the `ubuntu*` prefix
    * rule at :349-351). `debian` kept as richer-than-reference support —
    * the reference's map lacks it and silently drops Debian OSV packages
    * without an explicit purl. */
  val purlTypeByEcosystem: Map[String, String] = Map(
    "npm" -> "npm", "pypi" -> "pypi", "maven" -> "maven", "nuget" -> "nuget",
    "packagist" -> "composer", "rubygems" -> "gem", "go" -> "golang",
    "hex" -> "hex", "cargo" -> "cargo", "debian" -> "deb")

  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(String.valueOf).orNull

  private def opt(m: java.util.Map[String, Object], k: String): Option[String] =
    Option(m.get(k)).map(String.valueOf).filter(_.nonEmpty)

  private def mapOf(v: Object): Option[java.util.Map[String, Object]] =
    v match {
      case m: java.util.Map[_, _] =>
        Some(m.asInstanceOf[java.util.Map[String, Object]])
      case _ => None
    }

  private def listOf(m: java.util.Map[String, Object], k: String): Seq[Object] =
    m.get(k) match {
      case l: java.util.List[_] =>
        l.asScala.toSeq.asInstanceOf[Seq[Object]]
      case _ => Seq.empty
    }

  /** YAML may yield a native Date (unquoted `2024-12-13T05:15:07Z` is a
    * YAML timestamp scalar) or an ISO string (quoted / JSON). */
  private def ts(v: Object): Option[Timestamp] = v match {
    case d: java.util.Date => Some(new Timestamp(d.getTime))
    case s: String =>
      try Some(Timestamp.from(java.time.OffsetDateTime.parse(s).toInstant))
      catch { case _: Exception => None }
    case _ => None
  }

  /** Supported VCS hosts for commit patches
    * (advisory.py VCS_URLS_SUPPORTED_TYPES): base repo url or None. */
  private val VcsRepo =
    "^(https?://(?:github\\.com|gitlab\\.com|bitbucket\\.org)/[^/]+/[^/]+)"
      .r.unanchored

  def vcsBaseUrl(url: String): Option[String] =
    Option(url).flatMap {
      case VcsRepo(base) => Some(base.stripSuffix(".git"))
      case _ => None
    }

  /** `str(CVSS.base_score)` parity: one decimal, e.g. 5.2, 10.0. */
  private def fmtScore(d: Double): String = f"$d%.1f"

  /** univers version-class validity, shared shape across schemes: a
    * version starts with a digit (optionally `v`-prefixed). The captured
    * oss-fuzz fixture shows `rel/commons-configuration-2.9.0` tags being
    * rejected by GenericVersion and the whole pin list dropping. */
  private def validVersion(v: String): Boolean =
    v.nonEmpty && "^v?[0-9]".r.findFirstIn(v).isDefined

  private def severityRows(doc: java.util.Map[String, Object],
      advisoryUrl: String): Seq[SeverityRow] = {
    val typed = listOf(doc, "severity").flatMap(mapOf).flatMap { sv =>
      val t = Option(str(sv, "type")).getOrElse("").toLowerCase
      val score = Option(str(sv, "score")).getOrElse("")
      val system0 = t match {
        case "cvss_v3" => Some("cvssv3.1")
        case "cvss_v4" => Some("cvssv4")
        case "ubuntu" => Some("ubuntu-priority")
        // already-canonical ids pass through (osv_v2.py accepts any
        // SCORING_SYSTEMS key); cvss_v2 is unmapped -> dropped
        case s if Set("cvssv2", "cvssv3", "cvssv3.1", "cvssv4", "epss",
          "generic_textual")(s) => Some(s)
        case _ => None
      }
      system0.map { sys0 =>
        val sys = if (score.toLowerCase.startsWith("cvss:3.0/")) "cvssv3"
          else sys0
        val vector = if (score.endsWith("/")) score.dropRight(1) else score
        val computed = sys match {
          case "cvssv3" | "cvssv3.1" => Cvss.v3BaseScore(vector).map(fmtScore)
          case "cvssv4" => Cvss4.baseScore(vector).map(fmtScore)
          case _ => None
        }
        computed match {
          case Some(v) => SeverityRow(sys, v, score, advisoryUrl)
          case None => SeverityRow(sys, score, "", advisoryUrl)
        }
      }
    }
    val eco = mapOf(doc.get("ecosystem_specific"))
      .flatMap(m => opt(m, "severity"))
      .map(v => SeverityRow("generic_textual", v, "", ""))
    val db = mapOf(doc.get("database_specific"))
      .flatMap(m => opt(m, "severity"))
      .map(v => SeverityRow("generic_textual", v, "", ""))
    typed ++ eco ++ db
  }

  /** get_affected_purl (osv_v2.py:324-371): explicit purl wins (version
    * stripped), else ecosystem-mapped; maven names split on `:`. Returns
    * (purl string, purl type). */
  def purlFor(pkg: java.util.Map[String, Object]): Option[(String, String)] =
    opt(pkg, "purl") match {
      case Some(p) =>
        val ptype = p.stripPrefix("pkg:").takeWhile(_ != '/')
        // only the version is stripped — qualifiers survive (the
        // reference deletes just the version key from the purl dict;
        // captured ubuntu expected keeps `?arch=source&distro=trusty`)
        Some((p.replaceFirst("@[^?#]*", ""), ptype))
      case None =>
        val eco = Option(str(pkg, "ecosystem")).getOrElse("").toLowerCase
        val name = Option(str(pkg, "name")).getOrElse("")
        if (eco.isEmpty || name.isEmpty) None
        else if (eco.startsWith("ubuntu"))
          Some((s"pkg:deb/ubuntu/$name", "deb"))
        else purlTypeByEcosystem.get(eco).map {
          case "maven" =>
            val i = name.indexOf(':')
            if (i >= 0)
              (s"pkg:maven/${name.substring(0, i)}/${name.substring(i + 1)}",
                "maven")
            else (s"pkg:maven/$name", "maven")
          case "deb" => (s"pkg:deb/debian/$name", "deb")
          case t => (s"pkg:$t/$name", t)
        }
    }

  /** One parsed affected list: ranges, directed commit PATCHES (supported
    * VCS hosts, vcs base url + hash), and plain commit references
    * (unsupported hosts keep the raw repo url). The patch lists
    * accumulate across packages like the reference's
    * (osv_v2.py:91-92 lists initialized outside the affected loop). */
  private final case class AffectedParse(
      rows: Seq[AffectedRow],
      introPatches: Seq[(String, String)],
      fixedPatches: Seq[(String, String)],
      commitRefs: Seq[ReferenceRow])

  private def parseAffected(doc: java.util.Map[String, Object],
      supported: Option[Set[String]]): AffectedParse = {
    var rows = Vector.empty[AffectedRow]
    var intro = Vector.empty[(String, String)]
    var fixed = Vector.empty[(String, String)]
    var commitRefs = Vector.empty[ReferenceRow]
    listOf(doc, "affected").flatMap(mapOf).foreach { a =>
      val pkg = mapOf(a.get("package")).getOrElse(new java.util.HashMap())
      purlFor(pkg) match {
        case Some((purl, ptype))
            if supported.forall(_.contains(ptype)) =>
          val scheme = ptype
          var affEvents = Vector.empty[String]
          var fixEvents = Vector.empty[String]
          listOf(a, "ranges").flatMap(mapOf).foreach { rg =>
            val rtype = Option(str(rg, "type")).getOrElse("")
            val events = listOf(rg, "events").flatMap(mapOf)
            if (rtype == "GIT") {
              val repo = Option(str(rg, "repo")).getOrElse("")
              def classify(h: String, isFix: Boolean): Unit =
                vcsBaseUrl(repo) match {
                  case Some(base) =>
                    if (isFix) fixed :+= (base, h) else intro :+= (base, h)
                  case None if repo.nonEmpty =>
                    commitRefs :+= ReferenceRow(repo, "commit", h)
                  case None =>
                }
              events.foreach { e =>
                opt(e, "fixed").filter(_ != "0")
                  .foreach(classify(_, isFix = true))
                opt(e, "introduced").filter(_ != "0")
                  .foreach(classify(_, isFix = false))
              }
            } else if (rtype == "ECOSYSTEM" || rtype == "SEMVER") {
              events.foreach { e =>
                opt(e, "introduced").filter(_ != "0").filter(validVersion)
                  .foreach(v => affEvents :+= (">=" + v))
                opt(e, "fixed").filter(validVersion).foreach { v =>
                  affEvents :+= ("<" + v)
                  fixEvents :+= ("=" + v)
                }
                opt(e, "last_affected").filter(validVersion)
                  .foreach(v => affEvents :+= ("<=" + v))
              }
            }
          }
          val pins = listOf(a, "versions").map(String.valueOf)
            .filter(validVersion).map("=" + _)
          val lastKnown = mapOf(a.get("database_specific"))
            .flatMap(m => opt(m, "last_known_affected_version_range"))
            .map(GitlabIngest.rangeConstraints).getOrElse(Seq.empty)
          val affecting =
            if (pins.nonEmpty) pins
            else if (lastKnown.nonEmpty) lastKnown
            else affEvents
          if (affecting.nonEmpty || fixEvents.nonEmpty ||
              intro.nonEmpty || fixed.nonEmpty)
            rows :+= AffectedRow(purl,
              s"vers:$scheme/" + affecting.mkString("|"),
              s"vers:$scheme/" + fixEvents.mkString("|"))
        case _ => // unsupported or missing purl: whole package skipped
      }
    }
    AffectedParse(rows, intro, fixed, commitRefs)
  }

  /** Parse one OSV document (JSON or YAML). */
  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      text: String, advisoryUrl: String => String = defaultUrl,
      supported: Option[Set[String]] = None): Option[AdvisoryRow] = {
    val doc = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val id = str(doc, "id")
    if (id == null || id.isEmpty) return None
    val url = advisoryUrl(id)

    val summary = GitlabIngest.buildDescription(
      str(doc, "summary"), str(doc, "details"))
    // `upstream` ids extend aliases (osv_v2.py:84 — Ubuntu's OSV files
    // carry the upstream CVE there); the advisory id is never a
    // self-alias
    val aliases = (listOf(doc, "aliases") ++ listOf(doc, "upstream"))
      .map(String.valueOf).filter(a => a.nonEmpty && a != id).distinct
    val refs = listOf(doc, "references").flatMap(mapOf).flatMap { r =>
      opt(r, "url").map { u =>
        val t = Option(str(r, "type")).getOrElse("") match {
          case "ADVISORY" => "advisory"
          case "REPORT" => "bug"
          case "EXPLOIT" => "exploit"
          case _ => "other"
        }
        ReferenceRow(u, t, "")
      }
    }
    val affected = parseAffected(doc, supported)
    val commitRefs =
      affected.introPatches.map { case (base, h) =>
        ReferenceRow(base, "vulnerable_commit", h) } ++
      affected.fixedPatches.map { case (base, h) =>
        ReferenceRow(base, "fix_commit", h) } ++
      affected.commitRefs
    val weaknesses = mapOf(doc.get("database_specific")).toSeq
      .flatMap(m => listOf(m, "cwe_ids")).map(String.valueOf)
      .flatMap(c => c.stripPrefix("CWE-").toIntOption)
    val published = ts(doc.get("published"))
    val collected = ts(doc.get("modified")).orElse(published)
      .getOrElse(new Timestamp(0L))

    Some(AdvisoryRow(datasourceId, id, summary, aliases,
      refs ++ commitRefs, severityRows(doc, url), weaknesses,
      affected.rows, collected, published, url, 5))
  }

  def defaultUrl(id: String): String =
    s"https://osv.dev/vulnerability/$id"

  /** Parse a DataFrame of raw OSV documents (column `json`, plus
    * `datasource_id`) into typed advisories. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 5): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "json").as[(String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, text) => parseOne(yaml, ds, text) }
      }
      .map(r => if (precedence == 5) r else r.copy(precedence = precedence))
  }

  /** Read an OSV directory tree (one JSON/YAML per file) — S1's
    * git-checkout scan: wholetext keeps one advisory per row. */
  def readTree(spark: SparkSession, path: String,
      datasourceId: String): Dataset[AdvisoryRow] = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("json"), lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }
}
