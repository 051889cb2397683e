package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Apache Kafka cve-list ingestion (S2): the kafka.apache.org CVE page —
  * one `<h2 id="CVE-…">` section per advisory followed by a facts table
  * with "Versions affected" / "Fixed versions" / "Issue announced" rows
  * (pipelines/v2_importers/apache_kafka_importer.py:45-140,
  * pipes/apache_kafka.py:38-95). */
object ApacheKafkaIngest {

  private val Section =
    """(?s)<h2[^>]*\bid="(CVE-[^"]+)"[^>]*>(.*?)</h2>(.*?)(?=<h2|\z)""".r
  private val Href = """href="([^"]+)"""".r

  /** Log4j CVEs the reference lists without ranges
    * (apache_kafka_importer.py:42-50). */
  val CveWithoutRange: Set[String] = Set(
    "CVE-2022-23302", "CVE-2022-23305", "CVE-2022-23307",
    "CVE-2021-45046", "CVE-2021-44228", "CVE-2021-4104")

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]+>", " ").replaceAll("\\s+", " ").trim

  private def fact(body: String, label: String): Option[String] =
    s"""(?s)$label.*?<p[^>]*>(.*?)</p>""".r
      .findFirstMatchIn(body).map(m => stripTags(m.group(1)))

  /** parse_range (pipes/apache_kafka.py:38-79): strip a leading label,
    * "to" becomes a dash interval, commas separate, bare versions pin. */
  def rangeConstraints(raw0: String): Seq[String] = {
    var raw = raw0
    if (raw.contains(":")) raw = raw.substring(raw.indexOf(':') + 1)
    raw = raw.replace("to", "-").replace("and", "").replace("later", "")
      .trim
    raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { r =>
      if (!r.contains('-')) {
        if (r.matches("[0-9][0-9.]*")) Seq("=" + r) else Seq.empty
      } else r.split('-') match {
        case Array(lhs, rhs) =>
          Seq(lhs.trim).filter(_.matches("[0-9][0-9.]*")).map(">=" + _) ++
            Seq(rhs.trim).filter(_.matches("[0-9][0-9.]*")).map("<=" + _)
        case _ => Seq.empty
      }
    }
  }

  def parseItem(datasourceId: String, cve: String, titleHtml: String,
      body: String): AdvisoryRow = {
    val title = stripTags(titleHtml)
    val refUrl = Href.findFirstMatchIn(titleHtml).map(_.group(1))
    val affectedRaw = fact(body, "Versions affected").getOrElse("")
    val fixedRaw = fact(body, "Fixed versions").getOrElse("")
    val announced = fact(body, "Issue announced").flatMap { d =>
      try Some(Timestamp.valueOf(java.time.LocalDate.parse(
        d.take(10)).atStartOfDay()))
      catch {
        case _: Exception =>
          try Some(Timestamp.valueOf(java.time.LocalDate.parse(d,
            java.time.format.DateTimeFormatter.ofPattern("MMMM d, yyyy",
              java.util.Locale.ENGLISH)).atStartOfDay()))
          catch { case _: Exception => None }
      }
    }
    val summary = stripTags(body.split("<table").head)
    val (aff, fix) =
      if (CveWithoutRange.contains(cve)) (Seq.empty, Seq.empty)
      else (rangeConstraints(affectedRaw), rangeConstraints(fixedRaw))
    val affected =
      if (aff.isEmpty && fix.isEmpty) Seq.empty
      else Seq(AffectedRow("pkg:apache/kafka",
        "vers:semver/" + aff.mkString("|"),
        "vers:semver/" + fix.mkString("|")))

    AdvisoryRow(datasourceId, cve,
      if (summary.nonEmpty) summary else title, Seq.empty,
      refUrl.toSeq.map(u => ReferenceRow(u, "advisory", cve)),
      Seq.empty, Seq.empty, affected,
      announced.getOrElse(new Timestamp(0L)), announced,
      "https://kafka.apache.org/cve-list", 200)
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "html").as[(String, String)]
      .flatMap { case (ds, html) =>
        Section.findAllMatchIn(html).map(m =>
          parseItem(ds, m.group(1), m.group(2), m.group(3)))
      }
  }
}
