package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.TextUtil
import graft.model._

/** Istio security bulletins ingestion (S2): istio.io markdown files with
  * YAML front matter (title = ISTIO-SECURITY id, cves, releases prose)
  * (pipelines/v2_importers/istio_importer.py:59-182). Release phrases
  * ("All releases prior to X", "X to Y", bare versions) translate into
  * constraints emitted twice — as the github purl's semver range and the
  * golang module purl's range, like the reference. */
object IstioIngest {

  /** releases prose → constraints (istio_importer.py:144-176). */
  def releaseConstraints(releases: Seq[String]): Seq[String] = {
    // release shorthands pad to three segments ("1.1 to 1.1.15" →
    // >=1.1.0, captured istio expected)
    def pad(v: String): String = GlibcIngest.genericVersion(v)
    releases.map(_.trim).filter(_.nonEmpty).flatMap { r =>
      if (r.contains("All releases prior"))
        Seq("<" + pad(r.split(' ').last))
      else if (r.contains("All releases") && r.contains("and later"))
        Seq(r.replace("All releases", "").replace("and later", "")
          .trim).filter(_.nonEmpty).map(v => ">=" + pad(v))
      else if (r.contains(" to "))
        r.split(" to ", 2) match {
          case Array(lo, hi) =>
            Seq(">=" + pad(lo.trim), "<=" + pad(hi.trim))
          case _ => Seq.empty
        }
      else if (r.matches("^[0-9]+(\\.[0-9]+)*$")) Seq("=" + pad(r))
      else Seq.empty
    }
  }

  private def strList(m: java.util.Map[String, Object], k: String): Seq[String] =
    m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
      case null => Seq.empty
      case o => Seq(String.valueOf(o))
    }

  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      relPath: String, text: String): Option[AdvisoryRow] = {
    if (relPath.endsWith("_index.md")) return None
    val (front, _) = TextUtil.splitFrontMatter(text)
    val data = (try yaml.load[Object](front)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val title = Option(data.get("title")).map(String.valueOf).getOrElse("")
    if (!title.startsWith("ISTIO-SECURITY-")) return None
    val aliases = strList(data, "cves")
      .filter(_.matches("^CVE-\\d{4}-\\d{4,19}$"))
    val cons = releaseConstraints(strList(data, "releases"))
    val affected =
      if (cons.isEmpty) Seq.empty
      else Seq(
        // label-fidelity divergence: the reference spells the github
        // purl's range with GitHubVersionRange (importers/istio.py:25),
        // i.e. `vers:github/`; its version class IS SemverVersion, so
        // the value semantics are identical and only the scheme label
        // differs here
        AffectedRow("pkg:github/istio/istio",
          "vers:semver/" + cons.mkString("|"), "vers:semver/"),
        AffectedRow("pkg:golang/istio.io/istio",
          "vers:golang/" + cons.mkString("|"), "vers:golang/"))
    val published = data.get("publishdate") match {
      case d: java.util.Date => Some(new Timestamp(d.getTime))
      case s: String =>
        try Some(Timestamp.valueOf(
          java.time.LocalDate.parse(s.take(10)).atStartOfDay()))
        catch { case _: Exception => None }
      case _ => None
    }
    Some(AdvisoryRow(datasourceId, title,
      Option(data.get("description")).map(String.valueOf).getOrElse(""),
      aliases,
      Seq(ReferenceRow(s"https://istio.io/latest/news/security/$title/",
        "advisory", title)),
      Seq.empty, Seq.empty, affected,
      published.getOrElse(new Timestamp(0L)), published,
      s"https://github.com/istio/istio.io/blob/master/$relPath", 200))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "text").as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) => parseOne(yaml, ds, path, text) }
      }
  }
}
