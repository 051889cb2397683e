package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** nginx security-advisories ingestion (S2): the single HTML page listing
  * one `<li><p>` paragraph per advisory
  * (pipelines/v2_importers/nginx_importer.py:31-245).
  *
  * The page is machine-generated and rigidly regular (summary, Severity,
  * links, Not vulnerable:, Vulnerable: — `<br>`-separated), so the parse
  * is a per-item `<br>` split with tag stripping inside a flatMap —
  * no HTML library needed or available here. Version expressions follow
  * univers NginxVersionRange.from_native: `a-b` inclusive interval,
  * `x+` open floor, `all`, plain version pins.
  */
object NginxIngest {

  private val AdvisoriesUrl = "https://nginx.org/en/security_advisories.html"
  private val Item = "(?s)<li><p>(.*?)</p></li>".r
  private val Href = """(?s)<a\s+href="([^"]+)"[^>]*>(.*?)</a>""".r

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]+>", "").trim

  /** nginx branch convention: for `X.Y.Z+` an EVEN minor is a stable
    * branch, so "and up" stops at the next branch (`<X.(Y+1).0`); an odd
    * minor is the mainline, open-ended. Decoded from the 39 captured
    * advisories (test_data/nginx_v2: `1.26.1+` → `>=1.26.1|<1.27.0`,
    * `1.27.0+` → `>=1.27.0`), matching univers NginxVersionRange
    * .from_native. */
  private def plusConstraints(v: String): Seq[String] = {
    val parts = v.split('.')
    parts.lift(1).flatMap(_.toIntOption) match {
      case Some(m) if m % 2 == 0 =>
        Seq(">=" + v, "<" + parts(0) + "." + (m + 1) + ".0")
      case _ => Seq(">=" + v)
    }
  }

  /** `Vulnerable:`/`Not vulnerable:` expression → vers constraints.
    * `none` is not a version: the reference's from_native fails on it and
    * the whole range becomes null (captured CVE-2009-4487). */
  def rangeConstraints(expr: String): Seq[String] =
    expr.split(',').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { tok =>
      if (tok.equalsIgnoreCase("all") || tok == "*") Seq("*")
      else if (tok.equalsIgnoreCase("none")) Seq.empty
      else if (tok.endsWith("+")) plusConstraints(tok.dropRight(1))
      else if (tok.matches("[0-9][^-]*-[0-9].*")) {
        val i = tok.indexOf('-')
        Seq(">=" + tok.substring(0, i), "<=" + tok.substring(i + 1))
      } else Seq("=" + tok)
    }

  private def versionKey(c: String): Seq[Long] =
    c.dropWhile(ch => !ch.isDigit).split('.')
      .map(s => s.takeWhile(_.isDigit)).filter(_.nonEmpty).map(_.toLong).toSeq

  /** The reference runs VersionConstraint.simplify on the FIXED range
    * only (nginx_importer.py:126-131): sort constraints by version (upper
    * comparator first on ties) and collapse each consecutive run of
    * same-direction comparators — keep the loosest: first of a
    * lower-bound run, last of an upper run. Captured examples:
    * `0.8.15+, 0.7.62+, 0.6.39+, 0.5.38+` →
    * `>=0.5.38|<0.7.0|>=0.7.62|<0.9.0`. */
  def simplifyConstraints(cons: Seq[String]): Seq[String] = {
    if (cons.exists(c => !c.startsWith("<") && !c.startsWith(">"))) return cons
    implicit val ord: Ordering[Seq[Long]] = Ordering.Implicits.seqOrdering
    val sorted = cons.sortBy(c => (versionKey(c), if (c.startsWith("<")) 0 else 1))
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sorted.length) {
      val lower = sorted(i).startsWith(">")
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1).startsWith(">") == lower)
        j += 1
      out += (if (lower) sorted(i) else sorted(j))
      i = j + 1
    }
    out.result()
  }

  /** One top-level node of an advisory paragraph — either an `<a>` tag or
    * a text run between tags. The reference iterates the bs4 paragraph's
    * node children the same way (nginx_importer.py:184-226), which is
    * what puts `<a>VU#120541</a>&nbsp;<a>CVE-2009-3555</a>` into TWO
    * alias tokens, not one combined line. */
  private final case class Node(text: String, href: Option[String])

  private def trimNbsp(s: String): String =
    s.replaceAll("^[\\s\\u00a0]+|[\\s\\u00a0]+$", "")

  /** Split one `<br>` segment into its anchors and inter-anchor text. */
  private def nodesOf(segment: String): Seq[Node] = {
    val out = Vector.newBuilder[Node]
    var last = 0
    for (m <- Href.findAllMatchIn(segment)) {
      val before = trimNbsp(stripTags(segment.substring(last, m.start)))
      if (before.nonEmpty) out += Node(before, None)
      out += Node(trimNbsp(stripTags(m.group(2))), Some(m.group(1)))
      last = m.end
    }
    val tail = trimNbsp(stripTags(segment.substring(last)))
    if (tail.nonEmpty) out += Node(tail, None)
    out.result()
  }

  /** Parse one advisory paragraph (nginx_importer.py:158-245). */
  def parseItem(datasourceId: String, body: String): Option[AdvisoryRow] = {
    val children = body.split("<br>").toSeq.map(_.trim).filter(_.nonEmpty)
    if (children.isEmpty) return None
    val summary = stripTags(children.head)
    var aliases = Vector.empty[String]
    var severity: Option[String] = None
    var notVulnerable: Option[String] = None
    var vulnerable: Option[String] = None
    var references = Vector.empty[ReferenceRow]

    children.tail.foreach { child =>
      // the Vulnerable/Not vulnerable/Severity lines read as a whole
      // segment (tags stripped) so `Severity: <b>major</b>` keeps its
      // value — richer than the reference's per-node view, which sees
      // the bare `Severity: ` text node and drops the value
      val segText = trimNbsp(stripTags(child))
      val segLow = segText.toLowerCase
      if (segLow.startsWith("severity")) {
        severity = Some(segText.split(':').lift(1).map(_.trim).getOrElse(""))
          .filter(_.nonEmpty)
      } else if (segLow.contains("not vulnerable")) {
        notVulnerable = Some(segText)
      } else if (segLow.contains("vulnerable")) {
        vulnerable = Some(segText)
      } else nodesOf(child).foreach { node =>
        val text = node.text
        if (text.startsWith("CVE-") || text.startsWith("CORE-") ||
            text.startsWith("VU#")) {
          aliases :+= text
          if (text.startsWith("CVE-"))
            references :+= ReferenceRow(
              s"https://nvd.nist.gov/vuln/detail/$text", "advisory", text)
        } else node.href.foreach { link =>
          val abs = if (link.startsWith("http")) link
            else "https://nginx.org" + link
          if (link.contains("cve.mitre.org"))
            references :+= ReferenceRow(abs, "advisory", text)
          else if (link.contains("/download/patch"))
            references :+= ReferenceRow(abs, "patch", "")
          else
            references :+= ReferenceRow(abs, "other", "")
        }
      }
    }
    if (aliases.isEmpty) return None
    val advisoryId = aliases.last
    val rest = aliases.dropRight(1)

    def versOf(raw: Option[String], simplify: Boolean): (String, Boolean) = {
      val expr0 = raw.map(_.split(":").lift(1).getOrElse("").trim)
        .getOrElse("")
      val windows = expr0.contains("nginx/Windows")
      val expr = expr0.replace("nginx/Windows", "").trim
      val cons0 = if (expr.isEmpty) Seq.empty else rangeConstraints(expr)
      val cons = if (simplify) simplifyConstraints(cons0) else cons0
      ("vers:nginx/" + cons.mkString("|"), windows)
    }
    val (affVers, winA) = versOf(vulnerable, simplify = false)
    val (fixVers, winB) = versOf(notVulnerable, simplify = true)
    val purl = if (winA || winB) "pkg:nginx/nginx?os=windows"
      else "pkg:nginx/nginx"
    val affected =
      if (affVers == "vers:nginx/" && fixVers == "vers:nginx/") Seq.empty
      else Seq(AffectedRow(purl, affVers, fixVers))

    Some(AdvisoryRow(
      datasource_id = datasourceId,
      advisory_id = advisoryId,
      summary = summary,
      aliases = rest,
      references = references,
      severities = severity.toSeq.map(s =>
        SeverityRow("generic_textual", s, "", AdvisoriesUrl)),
      weaknesses = Seq.empty,
      affected = affected,
      date_collected = new Timestamp(0L),
      date_published = None,
      url = AdvisoriesUrl,
      precedence = 200))
  }

  /** Parse a DataFrame of (datasource_id, html) pages — each page holds
    * many `<li><p>` advisory items. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "html").as[(String, String)]
      .flatMap { case (ds, html) =>
        Item.findAllMatchIn(html).map(_.group(1)).flatMap(parseItem(ds, _))
      }
  }
}
