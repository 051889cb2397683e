package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Apache Tomcat security-page ingestion (S2): per-branch pages with
  * `<h3 id="Fixed_in_Apache_Tomcat_X">` sections whose paragraphs carry
  * a strong title + CVE link and an "Affects:" line
  * (pipelines/v2_importers/apache_tomcat_importer.py:68-322).
  *
  * Each advisory yields BOTH the apache purl and the maven
  * org.apache.tomcat purl like the reference. One deliberate divergence:
  * the reference appends the fixed version as an `=` pin INTO the
  * affected range; here it lands in fixed_vers where the model keeps
  * fixed versions. */
object TomcatIngest {

  private val Section =
    """(?s)<h3[^>]*\bid="Fixed_in_Apache_Tomcat[^"]*"[^>]*>(.*?)</h3>(.*?)(?=<h3|\z)""".r
  private val Para = "(?s)<p[^>]*>(.*?)</p>".r
  private val Strong = "(?s)<strong[^>]*>(.*?)</strong>".r
  private val CveLink = """(?s)<a[^>]*href="[^"]*CVE-[^"]*"[^>]*>(.*?)</a>""".r
  private val FixedVer = "Tomcat\\s+([\\d.]+)".r

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]+>", " ")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")
      .replaceAll("\\s+", " ").trim

  /** Affects grammar (to_version_ranges_apache): the line is a
    * COMMA-separATED list of ranges — the reference splits on ", "
    * first (apache_tomcat.py:280) and parses each piece: "a to b" /
    * "a-b" → interval, "<x" → upper bound, else a pin on the first
    * token. Without the comma split, "9.0.0.M1 to 9.0.17, 8.5.0 to
    * 8.5.39" collapsed into the inverted interval
    * [>=9.0.0.M1, <=8.5.39] that marks nearly everything affected. */
  def affectsConstraints(raw0: String): Seq[String] = {
    Option(raw0).getOrElse("").split(',').toSeq
      .map(_.trim).filter(_.nonEmpty).flatMap(affectsOne)
  }

  private def affectsOne(raw: String): Seq[String] =
    if (raw.contains("to")) {
      val parts = raw.split(' ')
      Seq(">=" + parts.head, "<=" + parts.last)
    } else if (raw.contains("-")) {
      val parts = raw.split('-')
      Seq(">=" + parts.head.trim, "<=" + parts.last.trim)
    } else if (raw.startsWith("<")) Seq("<" + raw.split('<').last.trim)
    else Seq("=" + raw.split(' ').head)

  final private case class Item(cve: String, summary: String,
      affects: String, fixedIn: String)

  private def parseItems(html: String): Seq[Item] = {
    Section.findAllMatchIn(html).toSeq.flatMap { sec =>
      val fixedIn = FixedVer.findFirstMatchIn(stripTags(sec.group(1)))
        .map(_.group(1)).getOrElse("")
      var current: Option[(String, String)] = None // (cve, summary)
      val out = Vector.newBuilder[Item]
      Para.findAllMatchIn(sec.group(2)).map(_.group(1)).foreach { p =>
        val strong = Strong.findFirstMatchIn(p).map(m => stripTags(m.group(1)))
        val cve = CveLink.findFirstMatchIn(p).map(m => stripTags(m.group(1)))
        val text = stripTags(p)
        (strong, cve) match {
          case (Some(s), Some(c)) =>
            current.foreach { case (pc, ps) =>
              out += Item(pc, ps, "", fixedIn)
            }
            current = Some((c, s))
          case _ if text.startsWith("Affects:") =>
            current.foreach { case (pc, ps) =>
              out += Item(pc, ps,
                text.stripPrefix("Affects:").trim, fixedIn)
            }
            current = None
          case _ => ()
        }
      }
      current.foreach { case (pc, ps) => out += Item(pc, ps, "", fixedIn) }
      out.result()
    }
  }

  def parseOnePage(datasourceId: String, pageUrl: String,
      html: String): Seq[AdvisoryRow] = {
    val pageId = pageUrl.split('/').last.stripSuffix(".html")
    parseItems(html).groupBy(_.cve).toSeq.sortBy(_._1).map {
      case (cve, items) =>
        val affected = items.flatMap { it =>
          val aff = affectsConstraints(it.affects)
          val fix = Option(it.fixedIn).filter(_.nonEmpty)
            .map("=" + _).toSeq
          Seq(
            AffectedRow("pkg:apache/tomcat",
              "vers:semver/" + aff.mkString("|"),
              "vers:semver/" + fix.mkString("|")),
            AffectedRow("pkg:maven/org.apache.tomcat/tomcat",
              "vers:maven/" + aff.mkString("|"),
              "vers:maven/" + fix.mkString("|")))
        }
        AdvisoryRow(datasourceId, s"$pageId/$cve", items.head.summary,
          Seq(cve), Seq(ReferenceRow(pageUrl, "advisory", cve)),
          Seq.empty, Seq.empty, affected, new Timestamp(0L), None,
          pageUrl, 200)
    }
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "page_url", "html")
      .as[(String, String, String)]
      .flatMap { case (ds, url, html) => parseOnePage(ds, url, html) }
  }
}
