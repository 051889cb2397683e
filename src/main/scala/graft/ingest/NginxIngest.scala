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

  /** `Vulnerable:`/`Not vulnerable:` expression → vers constraints. */
  def rangeConstraints(expr: String): Seq[String] =
    expr.split(',').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { tok =>
      if (tok.equalsIgnoreCase("all") || tok == "*") Seq("*")
      else if (tok.endsWith("+")) Seq(">=" + tok.dropRight(1))
      else if (tok.matches("[0-9][^-]*-[0-9].*")) {
        val i = tok.indexOf('-')
        Seq(">=" + tok.substring(0, i), "<=" + tok.substring(i + 1))
      } else Seq("=" + tok)
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
      val text = stripTags(child)
      val textLow = text.toLowerCase
      val href = Href.findFirstMatchIn(child).map(_.group(1))
      if (text.startsWith("CVE-") || text.startsWith("CORE-") ||
          text.startsWith("VU#")) {
        aliases :+= text
        if (text.startsWith("CVE-"))
          references :+= ReferenceRow(
            s"https://nvd.nist.gov/vuln/detail/$text", "advisory", text)
      } else if (textLow.contains("severity")) {
        severity = Some(text.split(':').lift(1).map(_.trim).getOrElse(""))
          .filter(_.nonEmpty)
      } else if (textLow.contains("not vulnerable")) {
        notVulnerable = Some(text)
      } else if (textLow.contains("vulnerable")) {
        vulnerable = Some(text)
      } else href.foreach { link =>
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
    if (aliases.isEmpty) return None
    val advisoryId = aliases.last
    val rest = aliases.dropRight(1)

    def versOf(raw: Option[String]): (String, Boolean) = {
      val expr0 = raw.map(_.split(":").lift(1).getOrElse("").trim)
        .getOrElse("")
      val windows = expr0.contains("nginx/Windows")
      val expr = expr0.replace("nginx/Windows", "").trim
      val cons = if (expr.isEmpty) Seq.empty else rangeConstraints(expr)
      ("vers:nginx/" + cons.mkString("|"), windows)
    }
    val (affVers, winA) = versOf(vulnerable)
    val (fixVers, winB) = versOf(notVulnerable)
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
