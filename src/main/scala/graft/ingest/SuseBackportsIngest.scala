package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** SUSE backports ingestion — legacy v1 importer
  * (importers/suse_backports.py:21-71), implemented for registry
  * completeness even though the reference's active registry no longer
  * loads it.
  *
  * Each YAML file is a one-element list whose `packages` map nests
  * package → "fixed" → version → [CVE ids]; every (package, version,
  * CVE) triple becomes one advisory whose only content is the resolved
  * `pkg:rpm/opensuse/<name>@<version>` purl (suse_backports.py:49-66).
  * The reference's bare `except TypeError: return advisories` on a
  * malformed shape — keep whatever parsed before the bad node — is
  * mirrored by the catch-and-return-partial below.
  */
object SuseBackportsIngest {

  private def asMap(o: Object): java.util.Map[String, Object] = o match {
    case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Object]]
    case _ => null
  }

  /** One YAML document text → advisories (suse_backports.py:49-66). */
  def parseFile(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      text: String, precedence: Int = 500): Seq[AdvisoryRow] = {
    val out = Seq.newBuilder[AdvisoryRow]
    try {
      val doc = (try yaml.load[Object](text)
        catch { case _: Exception => return Seq.empty }) match {
        case l: java.util.List[_] if !l.isEmpty =>
          asMap(l.get(0).asInstanceOf[Object])
        case _ => return Seq.empty
      }
      if (doc == null) return Seq.empty
      val packages = asMap(doc.get("packages"))
      if (packages == null) return Seq.empty
      for (pe <- packages.asInstanceOf[java.util.Map[Object, Object]]
          .entrySet().asScala) {
        val pkg = String.valueOf(pe.getKey)
        val fixed = asMap(asMap(pe.getValue).get("fixed"))
        if (fixed == null) throw new ClassCastException // ≙ TypeError
        // iterate raw entries: YAML version keys are not always strings
        // (an unquoted `2.24:` parses as a Double) — stringify like the
        // reference's str(version), never checkcast
        for (e <- fixed.asInstanceOf[java.util.Map[Object, Object]]
            .entrySet().asScala) {
          val version = String.valueOf(e.getKey)
          val vulns = e.getValue
          vulns match {
            case l: java.util.List[_] =>
              for (v <- l.asScala) {
                val vuln = String.valueOf(v)
                out += AdvisoryRow(datasourceId,
                  // v1 AdvisoryData carries no advisory id; derive a
                  // deterministic one from the triple
                  advisory_id = s"$vuln/$pkg@$version",
                  summary = "",
                  aliases = Seq(vuln),
                  references = Seq.empty,
                  severities = Seq.empty, weaknesses = Seq.empty,
                  affected = Seq(AffectedRow(
                    s"pkg:rpm/opensuse/$pkg",
                    affecting_vers = "",
                    fixed_vers = s"vers:rpm/=$version")),
                  date_collected = new Timestamp(0L),
                  date_published = None,
                  url = "", precedence = precedence)
              }
            case _ => throw new ClassCastException
          }
        }
      }
    } catch {
      // suse_backports.py:67-69: a malformed node aborts the file but
      // keeps advisories accumulated before it
      case _: ClassCastException | _: NullPointerException => ()
    }
    out.result()
  }

  /** raw: (datasource_id, text) — one row per backports YAML file. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 500): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "text").as[(String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, text) => parseFile(yaml, ds, text) }
      }
  }
}
