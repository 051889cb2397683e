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

  // the live page emits UNQUOTED attributes (`<h2 id=CVE-…>`) — the
  // quoted form is accepted too
  private val Section =
    """(?s)<h2[^>]*\bid="?(CVE-[^">\s]+)"?[^>]*>(.*?)</h2>(.*?)(?=<h2|\z)""".r
  private val Href = """href="?([^"\s>]+)"?""".r

  /** Log4j CVEs the reference lists without ranges
    * (apache_kafka_importer.py:42-50). */
  val CveWithoutRange: Set[String] = Set(
    "CVE-2022-23302", "CVE-2022-23305", "CVE-2022-23307",
    "CVE-2021-45046", "CVE-2021-44228", "CVE-2021-4104")

  /** Named/numeric entity decode (bs4 parity for the entities this page
    * actually uses; numeric forms handled generally). */
  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "rsquo" -> "’",
    "lsquo" -> "‘", "ldquo" -> "“", "rdquo" -> "”",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…")

  private def decodeEntities(s: String): String =
    "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r.replaceAllIn(s, m => {
      val e = m.group(1)
      def cp(s: String, radix: Int): Option[String] =
        try Some(new String(Character.toChars(Integer.parseInt(s, radix))))
        catch { case _: Exception => None }
      val out =
        if (e.startsWith("#x") || e.startsWith("#X"))
          cp(e.drop(2), 16).getOrElse(m.matched)
        else if (e.startsWith("#")) cp(e.drop(1), 10).getOrElse(m.matched)
        else NamedEntities.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })

  // tags drop with NO inserted space (bs4 .text concatenates text nodes
  // directly — `Log4j-v1.2.17<span>:</span>` reads "Log4j-v1.2.17:")
  private def stripTags(s: String): String =
    decodeEntities(s.replaceAll("<[^>]+>", ""))
      .replaceAll("\\s+", " ").trim

  private def fact(body: String, label: String): Option[String] =
    s"""(?s)$label.*?<p[^>]*>(.*?)</p>""".r
      .findFirstMatchIn(body).map(m => stripTags(m.group(1)))

  /** Four-component Kafka versions render the last segment as build
    * metadata in the apache scheme: `0.10.2.2` → `0.10.2+2` (univers
    * ApacheVersionRange, captured cve-list expected). */
  def apacheVersion(v: String): String =
    graft.functions.VersionOrd.render("apache", v)

  /** parse_range (pipes/apache_kafka.py:38-79): strip a leading label,
    * "to" becomes a dash interval, commas separate, bare versions pin. */
  def rangeConstraints(raw0: String): Seq[String] = {
    var raw = raw0
    if (raw.contains(":")) raw = raw.substring(raw.indexOf(':') + 1)
    raw = raw.replace("to", "-").replace("and", "").replace("later", "")
      .trim
    // a sentence period glued to the last version ("… and 2.8.0.")
    // is not part of it
    def clean(v: String): String = v.replaceAll("\\.+$", "")
    raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { r =>
      if (!r.contains('-')) {
        if (r.matches("[0-9][0-9.]*")) Seq("=" + apacheVersion(clean(r)))
        else Seq.empty
      } else r.split('-') match {
        case Array(lhs, rhs) =>
          Seq(lhs.trim).filter(_.matches("[0-9][0-9.]*"))
            .map(v => ">=" + apacheVersion(clean(v))) ++
            Seq(rhs.trim).filter(_.matches("[0-9][0-9.]*"))
              .map(v => "<=" + apacheVersion(clean(v)))
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
      val formats = Seq("MMMM d, yyyy", "d MMMM yyyy", "d MMM yyyy")
      val iso =
        try Some(Timestamp.valueOf(java.time.LocalDate.parse(
          d.take(10)).atStartOfDay()))
        catch { case _: Exception => None }
      iso.orElse(formats.view.flatMap { f =>
        try Some(Timestamp.valueOf(java.time.LocalDate.parse(d,
          java.time.format.DateTimeFormatter.ofPattern(f,
            java.util.Locale.ENGLISH)).atStartOfDay()))
        catch { case _: Exception => None }
      }.headOption)
    }
    // summary = build_description(title, <p> texts before the table) —
    // parse_summary collects only paragraph elements, so list markup
    // between them is skipped (pipes/apache_kafka.py:27-35); the title
    // keeps its CVE prefix (captured cve-list expected)
    val descr = "(?s)<p[^>]*>(.*?)</p>".r
      .findAllMatchIn(body.split("<table").head)
      .map(m => stripTags(m.group(1))).mkString(" ").trim
    val summary = GitlabIngest.buildDescription(title, descr)
    val (aff, fix) =
      if (CveWithoutRange.contains(cve)) (Seq.empty, Seq.empty)
      else (rangeConstraints(affectedRaw), rangeConstraints(fixedRaw))
    val affected =
      if (aff.isEmpty && fix.isEmpty) Seq.empty
      else Seq(AffectedRow("pkg:apache/kafka",
        "vers:apache/" + aff.mkString("|"),
        "vers:apache/" + fix.mkString("|")))

    AdvisoryRow(datasourceId, cve,
      if (summary.nonEmpty) summary else title, Seq.empty,
      refUrl.toSeq.map(u => ReferenceRow(u, "advisory", cve)),
      Seq.empty, Seq.empty, affected,
      announced.getOrElse(new Timestamp(0L)), announced,
      s"https://kafka.apache.org/community/cve-list/#$cve", 200)
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
