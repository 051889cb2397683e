package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** GSD (Global Security Database) ingestion — legacy v1 importer
  * (importers/gsd.py:30-95), implemented for registry completeness even
  * though the reference's active registry no longer loads it.
  *
  * One JSON file per advisory: aliases fold the GSD id/alias with the
  * cve.org and nvd.nist.gov namespace ids (gsd.py:72-76, order-preserving
  * dedupe per utils.py:299-305), the summary composes the CVE title with
  * the description via build_description (utils.py:326-339), references
  * come from cve.org reference_data plus the GSD entry's quirky
  * empty-string key (`gsd.get("")`, gsd.py:66 — mirrored verbatim), and
  * date_published parses nvd.nist.gov's publishedDate minute-precision
  * ISO form (gsd.py:196-203).
  *
  * Faithfulness notes:
  *   - gsd.py:81-84 COMPUTES severities and CPE configurations but never
  *     attaches them to the returned AdvisoryData — the emitted surface
  *     (aliases, summary, references, date_published) is what we mirror;
  *   - affected_packages is always empty, like the reference's output
  *     (the captured expected files pin this);
  *   - a missing `GSD.alias` contributes no element (the reference's
  *     `or []` default would crash its own dedupe on that path — we take
  *     the well-formed superset).
  */
object GsdIngest {

  private def obj(n: JsonNode, field: String): JsonNode = {
    val v = if (n == null) null else n.get(field)
    if (v == null || v.isNull) ObjectMapperHolder.mapper.createObjectNode()
    else v
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)

  private object ObjectMapperHolder {
    val mapper = new ObjectMapper()
  }

  /** CVE_data_meta.TITLE (gsd.py:98-105). */
  def getSummary(cve: JsonNode): String =
    optText(obj(cve, "CVE_data_meta"), "TITLE").getOrElse("")

  /** description.description_data[lang=eng].value list (gsd.py:146-154). */
  def getDescription(cve: JsonNode): Seq[String] =
    Option(obj(cve, "description").get("description_data")).toSeq
      .flatMap(_.elements().asScala)
      .filter(d => optText(d, "value").isDefined &&
        optText(d, "lang").contains("eng"))
      .map(_.get("value").asText)

  /** references.reference_data[].url (gsd.py:157-170). */
  def getReferences(cve: JsonNode): Seq[String] =
    Option(obj(cve, "references").get("reference_data")).toSeq
      .flatMap(_.elements().asScala)
      .flatMap(optText(_, "url"))

  /** CVE_data_meta.ID + source.advisory (gsd.py:173-190). */
  def getAliases(cve: JsonNode): Seq[String] =
    optText(obj(cve, "CVE_data_meta"), "ID").toSeq ++
      optText(obj(cve, "source"), "advisory").toSeq

  /** build_description (utils.py:326-339). */
  def buildDescription(summary: String, description: String): String = {
    val s = Option(summary).getOrElse("").trim
    val d = Option(description).getOrElse("").trim
    if (d.isEmpty) s
    else if (s.nonEmpty && !d.contains(s)) s + "\n" + d
    else d
  }

  /** publishedDate minute-precision ISO ("2022-06-23T07:15Z"). */
  def parsePublished(s: String): Option[Timestamp] = {
    val t = s.trim
    // ISO_OFFSET_DATE_TIME already accepts the minute-precision
    // "2021-06-23T07:15Z" form; the LocalDateTime fallback covers
    // offset-less captures (UTC by convention)
    val candidates = Seq(
      () => java.time.OffsetDateTime.parse(t).toInstant,
      () => java.time.LocalDateTime.parse(t)
        .toInstant(java.time.ZoneOffset.UTC))
    candidates.view.flatMap(f =>
      try Some(Timestamp.from(f()))
      catch { case _: java.time.format.DateTimeParseException => None })
      .headOption
  }

  /** One GSD file → AdvisoryRow (gsd.py:52-95). Returns None on
    * malformed JSON, matching the reference's logged-and-skipped error
    * path (gsd.py:46-48). */
  def parseOne(datasourceId: String, fileName: String, json: String,
      precedence: Int = 500): Option[AdvisoryRow] = {
    val root =
      try ObjectMapperHolder.mapper.readTree(json)
      catch { case _: Exception => return None }
    if (root == null || !root.isObject) return None

    val namespaces = obj(root, "namespaces")
    val cveOrg = obj(namespaces, "cve.org")
    val nvd = obj(namespaces, "nvd.nist.gov")
    val gsd = obj(root, "GSD")

    val gsdId = optText(gsd, "id").getOrElse(fileName)
    val gsdAlias = optText(gsd, "alias")
    val gsdDescription = optText(gsd, "description").getOrElse("")

    // gsd.py:66 reads the references list from the EMPTY-STRING key of
    // the GSD object — mirrored verbatim, quirk and all
    val gsdRefs = Option(gsd.get("")).filterNot(_.isNull).toSeq
      .flatMap(_.elements().asScala).map(_.asText)

    val details =
      if (gsdDescription.nonEmpty) gsdDescription
      else getDescription(cveOrg).mkString("")

    val aliases = (gsdAlias.toSeq :+ gsdId) ++
      getAliases(cveOrg) ++ getAliases(nvd)
    val deduped = aliases.distinct // order-preserving, utils dedupe

    val summary = buildDescription(getSummary(cveOrg), details)

    val refs = (getReferences(cveOrg) ++ gsdRefs)
      .map(u => ReferenceRow(u, "", ""))

    val published = optText(nvd, "publishedDate").flatMap(parsePublished)

    Some(AdvisoryRow(datasourceId, gsdId, summary, deduped, refs,
      Seq.empty, Seq.empty, Seq.empty,
      new Timestamp(0L), published, url = "", precedence = precedence))
  }

  /** raw: (datasource_id, path, json) — one row per GSD file. The
    * allowlist.json / non-JSON skip rule (gsd.py:39-42) is the reader's
    * glob, not the parser's concern. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 500): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "json")
      .as[(String, String, String)]
      .flatMap { case (ds, path, json) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseOne(ds, name, json, precedence)
      }
  }
}
