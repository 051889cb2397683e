package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** rubysec advisory-db ingestion (S2): per-gem (and per-ruby-engine)
  * YAML advisories (pipelines/v2_importers/ruby_importer.py:85-256).
  * unaffected_versions invert into affecting ranges; patched_versions
  * become fixed ranges; gem-native range grammar (commas, pessimistic
  * `~>`) reuses the gitlab translation. */
object RubyIngest {

  /** Invert a constraint like GemVersionRange.invert: flip each
    * comparator (conjunction → flattened disjunction of negations). */
  def invert(c: String): String =
    if (c.startsWith(">=")) "<" + c.drop(2)
    else if (c.startsWith("<=")) ">" + c.drop(2)
    else if (c.startsWith("!=")) "=" + c.drop(2)
    else if (c.startsWith(">")) "<=" + c.drop(1)
    else if (c.startsWith("<")) ">=" + c.drop(1)
    else if (c.startsWith("=")) "!=" + c.drop(1)
    else "!=" + c

  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(String.valueOf).orNull

  private def strList(m: java.util.Map[String, Object], k: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
      case _ => Seq.empty
    }
  }

  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      relPath: String, text: String): Option[AdvisoryRow] = {
    val doc = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val isGem = relPath.startsWith("gems/")
    val isRuby = relPath.startsWith("rubies/")
    if (!isGem && !isRuby) return None
    val name = if (isGem) str(doc, "gem") else str(doc, "engine")
    if (name == null) return None
    val purl = if (isGem) s"pkg:gem/$name" else s"pkg:ruby/$name"
    val scheme = if (isGem) "gem" else "generic"

    val advisoryId = relPath.stripSuffix(".yml")
    val aliases =
      Option(str(doc, "cve")).map("CVE-" + _).toSeq ++
      // "OSV-" (not "OSVDB-") is the REFERENCE's own alias spelling
      // for the osvdb field (ruby.py:149) — kept verbatim so aliases
      // join across the two engines
      Option(str(doc, "osvdb")).map("OSV-" + _).toSeq ++
      Option(str(doc, "ghsa")).map("GHSA-" + _).toSeq
    val title = Option(str(doc, "title")).getOrElse("").trim
    val desc = Option(str(doc, "description")).getOrElse("").trim
    val summary =
      if (desc.isEmpty) title
      else if (title.nonEmpty && !desc.contains(title)) title + "\n" + desc
      else desc
    val refs = Option(str(doc, "url")).toSeq.map(u =>
      ReferenceRow(u, "advisory", ""))
    val sevs =
      Option(str(doc, "cvss_v4")).map(v =>
        SeverityRow("cvssv4", v, "", "")).toSeq ++
      Option(str(doc, "cvss_v3")).map(v =>
        SeverityRow("cvssv3", v, "", "")).toSeq ++
      Option(str(doc, "cvss_v2")).map(v =>
        SeverityRow("cvssv2", v, "", "")).toSeq
    // one AffectedPackage per range like the reference: inverted
    // unaffected ranges affect, patched ranges fix
    val affected =
      strList(doc, "unaffected_versions").filter(_.nonEmpty).map { r =>
        val cons = GitlabIngest.rangeConstraints(r).map(invert)
        AffectedRow(purl, s"vers:$scheme/" + cons.mkString("|"),
          s"vers:$scheme/")
      } ++
      strList(doc, "patched_versions").filter(_.nonEmpty).map { r =>
        val cons = GitlabIngest.rangeConstraints(r)
        AffectedRow(purl, s"vers:$scheme/",
          s"vers:$scheme/" + cons.mkString("|"))
      }
    val published = Option(doc.get("date")).flatMap {
      case d: java.util.Date => Some(new Timestamp(d.getTime))
      case s: String =>
        try Some(Timestamp.valueOf(
          java.time.LocalDate.parse(s.take(10)).atStartOfDay()))
        catch { case _: Exception => None }
      case _ => None
    }

    Some(AdvisoryRow(datasourceId, advisoryId, summary, aliases, refs, sevs,
      Seq.empty, affected, published.getOrElse(new Timestamp(0L)), published,
      "https://github.com/rubysec/ruby-advisory-db/blob/master/" + relPath,
      5))
  }

  /** Parse rows of (datasource_id, path, yaml); path must keep the
    * `gems/...` / `rubies/...` prefix that selects the schema. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "yaml").as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) => parseOne(yaml, ds, path, text) }
      }
  }
}
