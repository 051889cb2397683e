package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.PurlCodec
import graft.model._

/** GitLab Advisory Database (community edition) ingestion (S2).
  *
  * One YAML document per advisory file, laid out as
  * `<gitlab_type>/<package_slug...>/<vuln_id>.yml`
  * (pipelines/v2_importers/gitlab_importer.py:126-330). YAML has no
  * Spark-native reader, so the parse is a Dataset flatMap with one
  * snakeyaml instance per partition — per-row imperative work distributed
  * across the scan, the same shape the reference runs per file.
  *
  * Range semantics: gitlab-native operator ranges (`<1.0.1`,
  * `>=1.0 <2.0`, `||` alternatives, ruby pessimistic `~>`) and
  * maven/nuget interval notation (`(,9.1.6)`, `[1.0,2.0)`) both translate
  * to vers constraint strings (univers from_gitlab_native /
  * from_native).
  */
object GitlabIngest {

  /** gitlab path scheme → purl type (gitlab_importer.py:61-70). `go` is
    * excluded from the reference's v2 map "pending upstream name
    * parsing", but the captured v1 golang fixture shows the slug maps
    * cleanly (`go/go.mozilla.org/sops/v3` →
    * `pkg:golang/go.mozilla.org/sops/v3`), so we keep it. */
  val purlTypeByScheme: Map[String, String] = Map(
    "conan" -> "conan", "gem" -> "gem", "go" -> "golang", "maven" -> "maven",
    "npm" -> "npm", "nuget" -> "nuget", "packagist" -> "composer",
    "pypi" -> "pypi")

  private val RepoBlobBase =
    "https://gitlab.com/gitlab-org/advisories-community/-/blob/main/"

  /** build_description (utils.py:326-339) — shared with OsvIngest. */
  def buildDescription(summary: String, description: String): String = {
    val s = Option(summary).getOrElse("").trim
    val d = Option(description).getOrElse("").trim
    if (d.isEmpty) s
    else if (s.nonEmpty && !d.contains(s)) s + "\n" + d
    else d
  }

  /** package_slug → purl string (gitlab_importer.py:154-179). */
  def purlFromSlug(slug: String): Option[String] = {
    val parts = slug.split('/').filter(_.nonEmpty)
    parts.headOption.flatMap(purlTypeByScheme.get).flatMap { ptype =>
      // purl normalizes pypi names to lowercase (packageurl spec; the
      // captured pypi expected shows Flask -> pkg:pypi/flask)
      def norm(name: String): String =
        if (ptype == "pypi") name.toLowerCase.replace('_', '-') else name
      if (parts.length == 2) Some(s"pkg:$ptype/${norm(parts(1))}")
      else if (parts.length >= 3)
        Some(s"pkg:$ptype/${parts.slice(1, parts.length - 1).mkString("/")}/${norm(parts.last)}")
      else None
    }
  }

  /** Ruby pessimistic `~>v`: >=v plus < the next minor/major bump. */
  private def pessimistic(v: String): Seq[String] = {
    val segs = v.split('.')
    if (segs.length < 2) Seq(">=" + v)
    else {
      val i = segs.length - 2
      val digits = segs(i).takeWhile(_.isDigit)
      if (digits.isEmpty) Seq(">=" + v)
      else Seq(">=" + v,
        "<" + (segs.take(i) :+ (digits.toLong + 1).toString).mkString("."))
    }
  }

  /** `[a,b)` / `(,b]` interval → constraint list. */
  private def bracketConstraints(t: String): Seq[String] = {
    val inner = t.substring(1, t.length - 1)
    val parts = inner.split(",", -1).map(_.trim)
    val lo = parts.headOption.getOrElse("")
    val hi = if (parts.length > 1) parts(1) else ""
    val loC = if (lo.isEmpty) None
      else Some((if (t.head == '[') ">=" else ">") + lo)
    val hiC = if (hi.isEmpty) None
      else Some((if (t.last == ']') "<=" else "<") + hi)
    if (parts.length == 1 && lo.nonEmpty) Seq("=" + lo)
    else (loC ++ hiC).toSeq
  }

  private def opToken(tok: String): Seq[String] = {
    if (tok.startsWith("~>")) pessimistic(tok.drop(2).trim)
    else if (tok.startsWith(">=") || tok.startsWith("<=") || tok.startsWith("!="))
      Seq(tok)
    else if (tok.startsWith("==")) Seq("=" + tok.drop(2))
    else if (tok.startsWith(">") || tok.startsWith("<") || tok.startsWith("="))
      Seq(tok)
    else Seq("=" + tok)
  }

  /** affected_range → vers constraints (`||` alternatives flatten; vers
    * interval-pairing restores the disjunction). */
  def rangeConstraints(range: String): Seq[String] =
    range.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { alt =>
      if (alt.startsWith("[") || alt.startsWith("("))
        bracketConstraints(alt)
      else
        // gem/npm native ranges separate operator and version with a
        // space (">= 5.2.4.3, < 6.0.0") — glue them before tokenizing
        alt.replaceAll("(>=|<=|!=|==|~>|[<>=])\\s+", "$1")
          .split("[,\\s]+").toSeq
          .filter(_.nonEmpty).flatMap(opToken)
    }

  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(String.valueOf).orNull

  private def strList(m: java.util.Map[String, Object], k: String): Seq[String] =
    m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
      case null => Seq.empty
      case other => Seq(String.valueOf(other))
    }

  private def ts(s: String): Option[Timestamp] =
    Option(s).filter(_.nonEmpty).flatMap { v =>
      try Some(Timestamp.valueOf(
        java.time.LocalDate.parse(v.take(10)).atStartOfDay()))
      catch { case _: Exception => None }
    }

  /** Parse one YAML advisory; None when malformed or versionless
    * (gitlab_importer.py:183-330). */
  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      relPath: String, text: String): Option[AdvisoryRow] = {
    val doc = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val identifier = str(doc, "identifier")
    if (identifier == null) return None
    val slug = Option(str(doc, "package_slug")).getOrElse("")
    val advisoryId = if (slug.nonEmpty) s"$slug/$identifier" else identifier
    // the reference keeps the identifiers list verbatim as aliases
    // (gitlab_importer.py:223 — no self-filter); the previous
    // `filter(_ != advisoryId)` compared against the slug-prefixed id
    // and so removed nothing anyway
    val aliases = strList(doc, "identifiers")
    val summary = buildDescription(str(doc, "title"), str(doc, "description"))
    // reference ids only for recognizable advisory urls (captured
    // gitlab expected: nvd detail -> CVE id, GHSA advisory page -> GHSA
    // id, commits/issues/blogs -> empty)
    val references = strList(doc, "urls").map { u =>
      val last = u.split('/').lastOption.getOrElse("")
      if (u.contains("nvd.nist.gov/vuln/detail/"))
        ReferenceRow(u, "advisory", last)
      else if (u.contains("/security/advisories/GHSA-") ||
          u.contains("github.com/advisories/GHSA-"))
        ReferenceRow(u, "advisory", last)
      else ReferenceRow(u, "other", "")
    }
    val weaknesses = strList(doc, "cwe_ids")
      .flatMap(c => c.stripPrefix("CWE-").toIntOption)
    val url = RepoBlobBase + relPath
    val severities =
      Option(str(doc, "cvss_v2")).map(v =>
        SeverityRow("cvssv2", null, v, url)).toSeq ++
      Option(str(doc, "cvss_v3")).map(v =>
        SeverityRow(if (v.startsWith("CVSS:3.1/")) "cvssv3.1" else "cvssv3",
          null, v, url)).toSeq
    val pubdate = ts(str(doc, "pubdate"))
    val collected = ts(str(doc, "date")).orElse(pubdate)
      .getOrElse(new Timestamp(0L))

    val affected = purlFromSlug(slug).toSeq.flatMap { purl =>
      val scheme = PurlCodec.parse(purl).versionScheme
      // composer versions shed their `v` prefix (univers ComposerVersion;
      // captured composer expected: fixed `v1.0.1` -> `1.0.1`)
      def norm(c: String): String =
        if (scheme == "composer" || scheme == "semver")
          c.replaceFirst("^([<>=!~^]*)v(\\d)", "$1$2")
        else c
      val aff = Option(str(doc, "affected_range")).map(_.trim)
        .filter(_.nonEmpty).map(rangeConstraints(_).map(norm))
        .getOrElse(Seq.empty)
      val fixed = strList(doc, "fixed_versions").filter(_.nonEmpty)
        .map("=" + _).map(norm)
      if (aff.isEmpty && fixed.isEmpty) Seq.empty
      else Seq(AffectedRow(purl,
        s"vers:$scheme/" + aff.mkString("|"),
        s"vers:$scheme/" + fixed.mkString("|")))
    }
    // a versioned slug with nothing parseable is dropped like the
    // reference's `not fixed_version_range and not affected_version_range`
    if (purlFromSlug(slug).isDefined && affected.isEmpty) return None

    Some(AdvisoryRow(
      datasource_id = datasourceId,
      advisory_id = advisoryId,
      summary = summary,
      aliases = aliases,
      references = references,
      severities = severities,
      weaknesses = weaknesses,
      affected = affected,
      date_collected = collected,
      date_published = pubdate,
      url = url,
      precedence = 100))
  }

  /** Parse a DataFrame of (datasource_id, path, yaml) rows. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "yaml")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) => parseOne(yaml, ds, path, text) }
      }
  }

  /** Read a checked-out advisories tree (one YAML per file) — the S1-style
    * scan: wholetext keeps one advisory per row. */
  def readTree(spark: SparkSession, path: String,
      datasourceId: String = "gitlab"): Dataset[AdvisoryRow] = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.yml").text(path)
      .select(col("value").as("yaml"),
        regexp_extract(input_file_name(), "([^/]+/[^/]+/[^/]+)$", 1).as("path"),
        lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }
}
