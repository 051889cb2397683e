package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.TextUtil
import graft.model._

/** Mozilla foundation-security-advisories ingestion (S2): MFSA announce
  * tree of `.yml` (plain YAML) and `.md` (YAML front matter + markdown
  * body) files (pipelines/v2_importers/mozilla_importer.py:50-243).
  *
  * YAML advisories fan out per contained CVE (`<mfsa-id>/<CVE>`);
  * markdown advisories take their summary from the paragraphs following
  * the `### Description` heading. `fixed_in` entries become per-product
  * fixed-version pins on `pkg:mozilla/<name>` purls.
  */
object MozillaIngest {

  private val MfsaFile = "mfsa(\\d{4}-\\d{2,3})\\.(md|yml)$".r
  private val CveRe = "^CVE-\\d{4}-\\d{4,19}$".r

  private def severityFromImpact(impact: String): String = {
    val v = Option(impact).getOrElse("").toLowerCase
      .replace("moderate", "medium")
    Seq("critical", "high", "medium", "low")
      .find(v.contains).getOrElse("none")
  }

  private def stripHtml(s: String): String =
    Option(s).getOrElse("").replaceAll("<[^>]+>", "").trim

  /** markdown body → text of the paragraphs after `### Description`
    * (mozilla_importer.py:180-194, without an HTML round-trip: paragraphs
    * run until the next heading or list marker). */
  /** The md bodies use literal HTML headings (`<h3>Description</h3>`
    * followed by `<p>` blocks, captured mfsa2006-02.md); plain markdown
    * `### Description` sections are accepted too. Paragraph texts join
    * with no separator like the reference's get_text concatenation
    * (mozilla_importer.py:180-192). */
  def descriptionFromMd(md: String): String = {
    val text = Option(md).getOrElse("")
    val htmlSection =
      "(?si)<h3[^>]*>\\s*description\\s*</h3>(.*?)(?=<h3|\\z)".r
        .findFirstMatchIn(text).map(_.group(1))
    htmlSection match {
      case Some(seg) =>
        "(?s)<p[^>]*>(.*?)</p>".r.findAllMatchIn(seg)
          .map(m => m.group(1).replaceAll("<[^>]+>", "")).mkString("")
          .trim
      case None =>
        val lines = text.split('\n')
        val start = lines.indexWhere(_.trim.toLowerCase
          .matches("#{1,6}\\s*description\\s*"))
        if (start < 0) return ""
        lines.drop(start + 1)
          .takeWhile(l => !l.trim.startsWith("#"))
          .mkString("\n").trim
    }
  }

  private def fixedIn(data: java.util.Map[String, Object]): Seq[AffectedRow] =
    (data.get("fixed_in") match {
      case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
      case _ => Seq.empty
    }).filter(s => s != null && s.nonEmpty && s != "null").flatMap { pkg =>
      val i = pkg.lastIndexOf(' ')
      if (i < 0) None
      else {
        val (name, version) = (pkg.substring(0, i), pkg.substring(i + 1))
        // four-dot versions are invalid in the reference too
        if (version.count(_ == '.') == 3 || name.isEmpty) None
        else Some(AffectedRow(s"pkg:mozilla/$name", "vers:generic/",
          // generic padding: "SeaMonkey 1.0" fixes at 1.0.0 (captured)
          s"vers:generic/=${GlibcIngest.genericVersion(version)}"))
      }
    }

  /** announced dates arrive as snakeyaml Date objects (unquoted ISO) or
    * English strings like "March 19, 2030" (the reference runs them
    * through dateparser). */
  private def announcedTs(v: Object): Option[Timestamp] = v match {
    case d: java.util.Date => Some(new Timestamp(d.getTime))
    case s: String if s.nonEmpty =>
      val t = s.trim
      (try Some(Timestamp.valueOf(
        java.time.LocalDate.parse(t.take(10)).atStartOfDay()))
      catch { case _: Exception => None }).orElse {
        try Some(Timestamp.valueOf(java.time.LocalDate.parse(t,
          java.time.format.DateTimeFormatter.ofPattern("MMMM d, yyyy",
            java.util.Locale.ENGLISH)).atStartOfDay()))
        catch { case _: Exception => None }
      }
    case _ => None
  }

  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      fileName: String, text: String): Seq[AdvisoryRow] = {
    val mfsaId = MfsaFile.findFirstMatchIn(fileName)
      .map(m => s"mfsa${m.group(1)}").getOrElse(return Seq.empty)
    val isMd = fileName.endsWith(".md")
    val (yamlText, body) =
      if (isMd) TextUtil.splitFrontMatter(text) else (text, "")
    val data = (try yaml.load[Object](yamlText)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return Seq.empty
    }
    // fileName is the repo-relative path (real trees: announce/<year>/…)
    val advisoryUrl =
      "https://github.com/mozilla/foundation-security-advisories/" +
        s"blob/master/$fileName"
    val mozUrl = s"https://www.mozilla.org/en-US/security/advisories/$mfsaId"
    val refs = Seq(ReferenceRow(mozUrl, "advisory", mfsaId))
    val packages = fixedIn(data)
    val published = announcedTs(data.get("announced"))
    val baseSummary =
      if (isMd) descriptionFromMd(body)
      else stripHtml(Option(data.get("description")).map(String.valueOf)
        .getOrElse(""))
    def sev(impact: String) = Seq(SeverityRow("generic_textual",
      severityFromImpact(impact), "", mozUrl))
    val topImpact = Option(data.get("impact")).map(String.valueOf).orNull

    val perCve = data.get("advisories") match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]].asScala.toSeq.collect {
          case (cve, adv: java.util.Map[_, _])
            if CveRe.findFirstIn(cve).isDefined =>
            val a = adv.asInstanceOf[java.util.Map[String, Object]]
            val advSummary = stripHtml(
              Option(a.get("description")).map(String.valueOf).getOrElse(""))
            AdvisoryRow(datasourceId, s"$mfsaId/$cve",
              (baseSummary + "\n" + advSummary).trim, Seq(cve), refs,
              sev(Option(a.get("impact")).map(String.valueOf).orNull),
              Seq.empty, packages,
              published.getOrElse(new Timestamp(0L)), published,
              advisoryUrl, 200)
        }
      case _ => Seq.empty
    }
    // md advisories list their CVEs only in the body's References
    // section — the captured v1 expected carries them as aliases (the
    // reference's v2 md branch drops them; we keep the richer data)
    val bodyCves =
      if (isMd) "CVE-\\d{4}-\\d{4,19}".r.findAllIn(body).toSeq.distinct
      else Seq.empty
    val cveRefs = bodyCves.map(c => ReferenceRow(
      s"https://cve.mitre.org/cgi-bin/cvename.cgi?name=$c", "advisory", c))
    if (perCve.nonEmpty) perCve
    else Seq(AdvisoryRow(datasourceId, mfsaId, baseSummary, bodyCves,
      refs ++ cveRefs, sev(topImpact), Seq.empty, packages,
      published.getOrElse(new Timestamp(0L)), published, advisoryUrl, 200))
  }

  /** Parse rows of (datasource_id, path, text) for both file kinds. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "text").as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) =>
          parseOne(yaml, ds, path.split('/').last, text)
        }
      }
  }
}
