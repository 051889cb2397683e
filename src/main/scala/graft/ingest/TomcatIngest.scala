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

  // both "Fixed in" and "Will not be fixed in" sections carry
  // advisories (the captured security pages have e.g.
  // Will_not_be_fixed_in_Apache_Tomcat_4.1.x paragraphs); only the
  // former contributes a fixed version
  private val Section =
    ("""(?s)<h3[^>]*\bid="((?:Fixed|Will_not_be_fixed)_in_Apache_Tomcat""" +
      """[^"]*)"[^>]*>(.*?)</h3>(.*?)(?=<h3|\z)""").r
  private val Para = "(?s)<p[^>]*>(.*?)</p>".r
  private val Strong = "(?s)<strong[^>]*>(.*?)</strong>".r
  private val CveLink = """(?s)<a[^>]*href="[^"]*CVE-[^"]*"[^>]*>(.*?)</a>""".r
  private val FixedVer = "Tomcat\\s+([0-9][\\w.]*)".r

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
    // a trailing '?' marks an UNVERIFIED bound on the page
    // ("4.0.0-4.0.2?") and parentheticals annotate uncertainty
    // ("4.1.32-4.1.34 (4.0.x unknown)") — neither is part of a version
    Option(raw0).getOrElse("").replace("?", "")
      .replaceAll("\\([^)]*\\)", "").split(',').toSeq
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
      affects: String, fixedIn: Seq[String])

  private def parseItems(html: String): Seq[Item] = {
    Section.findAllMatchIn(html).toSeq.flatMap { sec =>
      // a heading may name SEVERAL fixed versions ("Fixed in Apache
      // Tomcat 8.5.3 and 8.0.36") — every one is a fix pin. Version
      // tokens are taken AFTER the "Tomcat" word so the heading's date
      // span ("13 June 2016") contributes nothing.
      val fixedIn =
        if (!sec.group(1).startsWith("Fixed_in")) Seq.empty[String]
        else {
          val title = stripTags(sec.group(2))
          val i = title.indexOf("Tomcat")
          if (i < 0) Seq.empty
          else "[0-9][\\w.]*".r.findAllIn(title.substring(i)).toSeq
        }
      // (cves, summary) — a heading paragraph may list SEVERAL CVE
      // links after its <strong> title ("CVE-2002-2006, CVE-2000-0760"
      // on the captured page): each becomes its own advisory. A CVE
      // link INSIDE the <strong> is part of the title ("Fix for
      // CVE-2020-9484 was incomplete"), never the advisory's own id.
      var current: Option[(Seq[String], String)] = None
      val out = Vector.newBuilder[Item]
      def flush(affects: String): Unit = {
        current.foreach { case (cves, ps) =>
          cves.foreach(c => out += Item(c, ps, affects, fixedIn))
        }
        current = None
      }
      Para.findAllMatchIn(sec.group(3)).map(_.group(1)).foreach { p =>
        val strong = Strong.findFirstMatchIn(p).map(m => stripTags(m.group(1)))
        val outsideStrong = Strong.replaceAllIn(p, "")
        val cves = CveLink.findAllMatchIn(outsideStrong)
          .map(m => stripTags(m.group(1)))
          .filter(_.startsWith("CVE-")).toSeq.distinct
        val text = stripTags(p)
        (strong, cves) match {
          case (Some(s), cs) if cs.nonEmpty =>
            flush("")
            current = Some((cs, s))
          case _ if text.startsWith("Affects:") =>
            flush(text.stripPrefix("Affects:").trim)
          case _ => ()
        }
      }
      flush("")
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
          val fix = it.fixedIn.map("=" + _)
          // the apache scheme coerces versions like SemverVersion
          // (captured tomcat expected): the numeric base pads to three
          // segments ("3.1" -> 3.1.0), a 4th dotted component becomes
          // build metadata ("9.0.0.M1" -> 9.0.0+M1) and a glued letter
          // suffix becomes a prerelease ("3.3a" -> 3.3.0-a) — the
          // maven side keeps the native spelling verbatim
          def apacheV(c: String): String = {
            val i = c.indexWhere(_.isDigit)
            if (i < 0) c
            else {
              val (op, v) = c.splitAt(i)
              val m = "^([0-9]+(?:\\.[0-9]+)*)(.*)$".r
                .findFirstMatchIn(v).get
              val segs = m.group(1).split('.')
              val base =
                (segs ++ Seq.fill(3 - segs.length)("0")).take(3)
                  .mkString(".")
              val rem = m.group(2)
              val coerced =
                if (rem.isEmpty) base
                else if (rem.startsWith(".")) base + "+" + rem.drop(1)
                else if (rem.startsWith("-") || rem.startsWith("+"))
                  base + rem
                else base + "-" + rem
              op + coerced
            }
          }
          Seq(
            AffectedRow("pkg:apache/tomcat",
              "vers:apache/" + aff.map(apacheV).mkString("|"),
              "vers:apache/" + fix.map(apacheV).mkString("|")),
            AffectedRow("pkg:maven/org.apache.tomcat/tomcat",
              "vers:maven/" + aff.mkString("|"),
              "vers:maven/" + fix.mkString("|")))
        }
        // the strong title's "Low:"/"Important:" prefix is the
        // project's own severity scale (captured expected: system
        // apache_tomcat)
        val severities = items.head.summary.split(':').headOption
          .map(_.trim)
          .filter(Set("Low", "Moderate", "Important", "High", "Critical"))
          .map(v => SeverityRow("apache_tomcat", v, "", pageUrl)).toSeq
        AdvisoryRow(datasourceId, s"$pageId/$cve", items.head.summary,
          Seq(cve), Seq(ReferenceRow(pageUrl, "advisory", cve)),
          severities, Seq.empty, affected, new Timestamp(0L), None,
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
