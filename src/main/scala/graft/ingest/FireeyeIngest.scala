package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Mandiant/FireEye vulnerability-disclosures ingestion (S2): one
  * markdown file per advisory, sectioned by `##` headers (Description,
  * Impact, CVE Reference, References, Common Weakness Enumeration)
  * (pipelines/v2_importers/fireeye_importer_v2.py:92-230). */
object FireeyeIngest {

  private val CveRe = "CVE-\\d{4}-\\d{4,19}".r
  private val UrlRe = "https?://[^\\s)\\]]+".r

  /** header line → following non-header lines
    * (fireeye_importer_v2.py:169-183). */
  def mdSections(lines: Seq[String]): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[String]]
    var key = ""
    lines.foreach { l =>
      if (l.startsWith("#")) { out(l) = Vector.empty; key = l }
      else out.updateWith(key) {
        case Some(v) => Some(v :+ l)
        case None => Some(Vector(l))
      }
    }
    out.toMap
  }

  def parseOne(datasourceId: String, relPath: String,
      text: String): Option[AdvisoryRow] = {
    val stem = relPath.split('/').last.stripSuffix(".md")
    if (stem.toUpperCase == "README" || !relPath.endsWith(".md")) return None
    val lines = text.replace("\r\n", "\n").replace("\n\n", "\n").split('\n')
      .toSeq
    // a disclosure always opens with its "# <id>" header; anything else
    // is an unparseable file
    if (lines.isEmpty || !lines.head.startsWith("#")) return None
    val sections = mdSections(lines)
    def section(h: String): Seq[String] =
      sections.getOrElse(h, Seq.empty).map(_.trim).filter(_.nonEmpty)

    val titleKey = lines.head
    val summary = sections.getOrElse(titleKey, Seq.empty)
      .map(_.trim).filter(_.nonEmpty).mkString(" ")
    val description = section("## Description").mkString(" ")
    val fullSummary =
      if (description.isEmpty) summary
      else if (summary.nonEmpty && !description.contains(summary))
        summary + "\n" + description
      else description

    val aliases = (section("## CVE ID") ++ section("## CVE Reference"))
      .flatMap(CveRe.findAllIn(_)).distinct.filter(_ != stem)
    val references = section("## References")
      .map(_.replaceAll("^[-* ]+", ""))
      .flatMap(UrlRe.findFirstIn(_))
      .map(u => ReferenceRow(u, "other", ""))
    // `High - reason`, `Medium: reason`, or a bare leading word; anything
    // not High/Medium/Low is no severity (fireeye_importer_v2.py:218-230)
    val severities = section("## Impact").headOption.toSeq.flatMap { impact =>
      val value =
        if (impact.contains(" - ")) impact.split(" - ").head
        else if (impact.contains(": ")) impact.split(": ").head
        else impact.split(' ').headOption.getOrElse("")
      if (Set("high", "medium", "low")(value.toLowerCase))
        Seq(SeverityRow("generic_textual", value, "", ""))
      else Seq.empty
    }
    val weaknesses = section("## Common Weakness Enumeration")
      .flatMap("CWE-(\\d+)".r.findAllMatchIn(_).map(_.group(1).toInt))
      .distinct

    Some(AdvisoryRow(datasourceId, stem, fullSummary, aliases, references,
      severities, weaknesses, Seq.empty, new Timestamp(0L), None,
      "https://github.com/mandiant/Vulnerability-Disclosures/blob/master/" +
        relPath, 5))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "text").as[(String, String, String)]
      .flatMap { case (ds, path, text) => parseOne(ds, path, text) }
  }
}
