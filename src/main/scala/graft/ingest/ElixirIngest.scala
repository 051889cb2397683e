package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Elixir (hex) security advisories ingestion (S2): one YAML per package
  * advisory (pipelines/v2_importers/elixir_security_importer.py:74-160).
  * unaffected_versions stay as-is and patched_versions invert — together
  * they form the hex affecting range; advisories without a valid CVE are
  * skipped like the reference. */
object ElixirIngest {

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
    val cveRaw = Option(str(doc, "cve")).getOrElse("")
    val cve = if (cveRaw.isEmpty) "" else
      if (cveRaw.startsWith("CVE-")) cveRaw else s"CVE-$cveRaw"
    if (!cve.matches("^CVE-\\d{4}-\\d{4,19}$")) return None

    val pkg = Option(str(doc, "package")).getOrElse("")
    val advisoryId = relPath.split('/').takeRight(2).mkString("/")
      .stripSuffix(".yml")
    val refs = Option(str(doc, "link")).filter(_.nonEmpty).toSeq.map(u =>
      ReferenceRow(u, "advisory", ""))
    val published = doc.get("disclosure_date") match {
      case d: java.util.Date => Some(new Timestamp(d.getTime))
      case s: String =>
        try Some(Timestamp.valueOf(
          java.time.LocalDate.parse(s.take(10)).atStartOfDay()))
        catch { case _: Exception => None }
      case _ => None
    }
    val constraints =
      strList(doc, "unaffected_versions").filter(_.nonEmpty)
        .flatMap(GitlabIngest.rangeConstraints) ++
      strList(doc, "patched_versions").filter(_.nonEmpty)
        .map(v => if (v.startsWith("~>")) v.drop(2).trim else v)
        .flatMap(GitlabIngest.rangeConstraints).map(RubyIngest.invert)
    val affected = if (pkg.isEmpty) Seq.empty else Seq(
      AffectedRow(s"pkg:hex/$pkg",
        "vers:semver/" + constraints.mkString("|"), "vers:semver/"))

    Some(AdvisoryRow(datasourceId, advisoryId,
      Option(str(doc, "description")).getOrElse("").trim, Seq(cve), refs,
      Seq.empty, Seq.empty, affected,
      published.getOrElse(new Timestamp(0L)), published,
      "https://github.com/dependabot/elixir-security-advisories/" +
        s"blob/master/$relPath", 5))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "yaml").as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) => parseOne(yaml, ds, path, text) }
      }
  }
}
