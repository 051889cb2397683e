package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** PostgreSQL security page ingestion (S2): the support/security HTML
  * table — one row per (CVE, affected, fixed, severity link, summary)
  * (pipelines/v2_importers/postgresql_importer.py:70-155). Like the
  * nginx page, the table is machine-generated and rigidly regular, so a
  * per-row regex parse replaces BeautifulSoup. */
object PostgresqlIngest {

  private val Row = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val Cell = "(?s)<td[^>]*>(.*?)</td>".r
  private val Href = """href="([^"]+)"""".r
  private val CveRe = "CVE-\\d{4}-\\d{4,19}".r
  private val VectorAnchor =
    """(?s)<a[^>]*href="([^"]*v3-calculator[^"]*)"[^>]*>(.*?)</a>""".r

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]+>", "").trim

  def parseItem(datasourceId: String, row: String,
      pageUrl: String): Option[AdvisoryRow] = {
    val cells = Cell.findAllMatchIn(row).map(_.group(1)).toSeq
    if (cells.length != 5) return None
    val Seq(refCol, affectedCol, fixedCol, severityCol, descCol) = cells
    val cve = CveRe.findFirstIn(stripTags(refCol)).getOrElse(return None)
    val summary = stripTags(descCol)

    val references = Href.findAllMatchIn(refCol).map(_.group(1)).toSeq
      .map { link =>
        val abs = if (link.startsWith("/"))
          "https://www.postgresql.org" + link else link
        ReferenceRow(abs, "advisory", "")
      }

    val severities = VectorAnchor.findFirstMatchIn(severityCol).toSeq
      .flatMap { m =>
        val href = m.group(1)
        val score = stripTags(m.group(2))
        "[?&]vector=([^&\"]+)".r.findFirstMatchIn(href).map { q =>
          val vector = "CVSS:3.0/" +
            q.group(1).replaceAll("^CVSS:3\\.0/", "")
          SeverityRow("cvssv3", score, vector, "")
        }
      }

    // generic padding: the affected column lists majors ("12, 9.6") that
    // normalize to 12.0.0 / 9.6.0 (captured postgresql expected)
    def pins(col: String) = stripTags(col).split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map(v => "=" + GlibcIngest.genericVersion(v))
    val (aff, fix) = (pins(affectedCol), pins(fixedCol))
    val qualifiers =
      if (summary.toLowerCase.contains("windows")) "?os=windows" else ""
    val affected =
      if (aff.isEmpty && fix.isEmpty) Seq.empty
      else Seq(AffectedRow(s"pkg:generic/postgresql$qualifiers",
        "vers:generic/" + aff.mkString("|"),
        "vers:generic/" + fix.mkString("|")))

    Some(AdvisoryRow(datasourceId, cve, summary, Seq.empty, references,
      severities, Seq.empty, affected, new Timestamp(0L), None,
      s"https://www.postgresql.org/support/security/$cve", 200))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val pageUrl = "https://www.postgresql.org/support/security/"
    raw.select("datasource_id", "html").as[(String, String)]
      .flatMap { case (ds, html) =>
        // first table's body only, like the reference's tables[0]
        val tbody = "(?s)<tbody[^>]*>(.*?)</tbody>".r
          .findFirstMatchIn(html).map(_.group(1)).getOrElse("")
        Row.findAllMatchIn(tbody).map(_.group(1))
          .flatMap(parseItem(ds, _, pageUrl))
      }
  }
}
