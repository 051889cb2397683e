package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.{PurlCodec, TextUtil}
import graft.model._

/** SAP project-kb statement.yaml ingestion (S2): per-vulnerability
  * statements carrying notes, fixing commits and versioned artifact
  * purls flagged affected/fixed
  * (pipelines/v2_importers/project_kb_statements_importer.py:63-180). */
object ProjectKbStatementsIngest {

  private def list(m: java.util.Map[String, Object],
      k: String): Seq[java.util.Map[String, Object]] =
    m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.collect {
        case e: java.util.Map[_, _] =>
          e.asInstanceOf[java.util.Map[String, Object]]
      }
      case _ => Seq.empty
    }

  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(String.valueOf).orNull

  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      relPath: String, text: String): Option[AdvisoryRow] = {
    val doc = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val vulnId = Option(str(doc, "vulnerability_id")).getOrElse(return None)

    val notes = list(doc, "notes")
    val summary = notes.flatMap(n => Option(str(n, "text"))).mkString("\n")
    val noteLinks = notes.flatMap { n =>
      n.get("links") match {
        case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
        case _ => Seq.empty
      }
    }.map(u => ReferenceRow(u, "other", ""))

    // fixing commits become directed fix_commit references against the
    // repo base url, plus a repo-derived package (the reference's
    // classify_patch_source base_purl + fixed_by_commit_patches shape,
    // captured kb-statements-expected)
    val fixCommits = list(doc, "fixes").flatMap(f => list(f, "commits"))
      .flatMap { c =>
        val repo = Option(str(c, "repository")).map(_.stripSuffix(".git"))
        val hash = Option(str(c, "id")).filter(TextUtil.isCommit)
        (repo, hash) match {
          case (Some(r), Some(h)) => Some((r, h))
          case _ => None
        }
      }
    val commitRefs = fixCommits.map { case (r, h) =>
      ReferenceRow(r, "fix_commit", h)
    }
    val commitPackages = fixCommits.map(_._1).distinct.flatMap { r =>
      "^https?://(github\\.com|gitlab\\.com|bitbucket\\.org)/([^/]+)/([^/]+)"
        .r.findFirstMatchIn(r).map { m =>
          val t = m.group(1).takeWhile(_ != '.')
          AffectedRow(
            s"pkg:$t/${m.group(2).toLowerCase}/${m.group(3).toLowerCase}",
            "", "")
        }
    }

    // artifacts: versioned purls flagged affected -> pins per base purl
    val byBase = list(doc, "artifacts").flatMap { a =>
      for {
        purlStr <- Option(str(a, "id"))
        parsed <- try Some(PurlCodec.parse(purlStr))
          catch { case _: Exception => None }
        if parsed.version.nonEmpty
      } yield (parsed.plain.copy(version = "").format,
        parsed.versionScheme, parsed.version,
        String.valueOf(a.get("affected")) == "true")
    }.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1._1)
    val affected = byBase.map { case ((base, scheme), vs) =>
      val aff = vs.filter(_._4).map("=" + _._3).sorted
      val fix = vs.filterNot(_._4).map("=" + _._3).sorted
      AffectedRow(base, s"vers:$scheme/" + aff.mkString("|"),
        s"vers:$scheme/" + fix.mkString("|"))
    }

    Some(AdvisoryRow(datasourceId, vulnId, summary, Seq.empty,
      noteLinks ++ commitRefs, Seq.empty, Seq.empty,
      affected ++ commitPackages.filterNot(p =>
        affected.exists(_.purl == p.purl)),
      new Timestamp(0L), None,
      "https://github.com/SAP/project-kb/blob/main/" + relPath, 200))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "yaml").as[(String, String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, path, text) =>
          if (path.endsWith("statement.yaml")) parseOne(yaml, ds, path, text)
          else None
        }
      }
  }
}
