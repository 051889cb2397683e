package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.{PurlCodec, VersionOrd}
import graft.model._

/** Kaybee (SAP project "KB") statement ingestion — legacy v1 importer
  * (importers/kaybee.py:20-62), implemented for registry completeness
  * even though the reference's active registry no longer loads it.
  *
  * One YAML statement per vulnerability: `vulnerability_id`, purl-string
  * `artifacts` flagged affected/resolved, and `fixes[].commits[]` that
  * become `<repository>/<id>` references. Affected purls pair with their
  * nearest-greater resolved version via nearest_patched_package
  * (utils.py:176-202).
  *
  * Faithfulness notes:
  *   - the summary gate mirrors kaybee.py:43-45 verbatim: the notes are
  *     joined ONLY when a truthy top-level `text` key exists (the
  *     reference checks `data.get("text")` but reads `data["notes"]`) —
  *     in practice statements carry `notes`, not `text`, so the summary
  *     is almost always empty;
  *   - nearest_patched_package sorts and bisects by VERSION ONLY
  *     (utils.py:150-154 compares version classes, never names), so a
  *     statement whose artifacts span several packages can pair a
  *     vulnerable purl with another package's resolved version — we keep
  *     the vulnerable purl as the row key and mirror the pairing.
  */
object KaybeeIngest {

  /** purl type → version-ordering scheme (RANGE_CLASS_BY_SCHEMES keys
    * the reference indexes by purl type, utils.py:147). Unknown types
    * fall back to generic ordering, like univers' GenericVersionRange. */
  def schemeOf(ptype: String): String =
    if (VersionOrd.schemes(ptype)) ptype else "generic"

  /** nearest_patched_package (utils.py:176-202): sort both sides by
    * version, bisect each vulnerable version RIGHT into the resolved
    * list — the nearest strictly-greater resolved purl, None when the
    * vulnerable version sorts at or past the last fix. */
  def nearestPatchedPairs(vulnerable: Seq[PurlCodec.Purl],
      resolved: Seq[PurlCodec.Purl])
      : Seq[(PurlCodec.Purl, Option[PurlCodec.Purl])] = {
    def key(p: PurlCodec.Purl): String =
      VersionOrd.sortKey(schemeOf(p.ptype), p.version)
    val vSorted = vulnerable.sortBy(key)
    val rSorted = resolved.sortBy(key)
    val rKeys = rSorted.map(key)
    vSorted.map { v =>
      val k = key(v)
      // bisect_right: first resolved strictly greater (ties go left)
      val i = rKeys.indexWhere(_ > k)
      (v, if (i >= 0) Some(rSorted(i)) else None)
    }
  }

  /** Pairs → AffectedRows with `=` pins in the purl type's scheme. */
  def pairsToAffected(
      pairs: Seq[(PurlCodec.Purl, Option[PurlCodec.Purl])])
      : Seq[AffectedRow] =
    pairs.map { case (v, p) =>
      val scheme = schemeOf(v.ptype)
      AffectedRow(
        v.copy(version = "").format,
        affecting_vers = s"vers:$scheme/=${v.version}",
        fixed_vers = p.map(r =>
          s"vers:${schemeOf(r.ptype)}/=${r.version}").getOrElse(""))
    }

  private def strOf(o: Object): String = String.valueOf(o)

  private def listOf(m: java.util.Map[String, Object], k: String)
      : Seq[java.util.Map[String, Object]] =
    m.get(k) match {
      case l: java.util.List[_] => l.asScala.toSeq.collect {
        case e: java.util.Map[_, _] =>
          e.asInstanceOf[java.util.Map[String, Object]]
      }
      case _ => Seq.empty
    }

  /** One statement YAML → advisory (kaybee.py:36-62). */
  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      text: String, precedence: Int = 500): Option[AdvisoryRow] = {
    val data = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return None
    }
    val vulnId = Option(data.get("vulnerability_id")).map(strOf)
      .getOrElse(return None)

    val summary =
      if (Option(data.get("text")).map(strOf).exists(_.nonEmpty))
        // links-only notes (no `text` key) contribute nothing — the
        // raw strOf would render them as the literal string "null"
        listOf(data, "notes").flatMap(n => Option(n.get("text")))
          .map(strOf).mkString("\n")
      else ""

    val (impacted, resolvedP) = listOf(data, "artifacts").flatMap { a =>
      val purl =
        try Some(PurlCodec.parse(strOf(a.get("id"))))
        catch { case _: Exception => None }
      purl.map(p => (p, a.get("affected") match {
        case b: java.lang.Boolean => b.booleanValue()
        case o => strOf(o) == "true"
      }))
    }.partition(_._2)

    // a commit entry missing repository or id is malformed (the
    // reference would KeyError the whole statement); skip the entry
    // rather than emit a "null/<sha>" url
    val refs = for {
      fix <- listOf(data, "fixes")
      commit <- listOf(fix, "commits")
      repo <- Option(commit.get("repository")).map(strOf)
      cid <- Option(commit.get("id")).map(strOf)
    } yield ReferenceRow(s"$repo/$cid", "", "")

    Some(AdvisoryRow(datasourceId, vulnId, summary, Seq(vulnId), refs,
      Seq.empty, Seq.empty,
      pairsToAffected(
        nearestPatchedPairs(impacted.map(_._1), resolvedP.map(_._1))),
      new Timestamp(0L), None, url = "", precedence = precedence))
  }

  /** raw: (datasource_id, text) — one row per statement YAML. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 500): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "text").as[(String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, text) => parseOne(yaml, ds, text) }
      }
  }
}
