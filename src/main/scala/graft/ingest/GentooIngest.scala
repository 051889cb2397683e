package graft.ingest

import java.io.ByteArrayInputStream
import java.sql.Timestamp

import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Gentoo GLSA ingestion (S2): one XML per advisory with synopsis,
  * CVE references, impact type and per-package vulnerable/unaffected
  * ranges (pipelines/v2_importers/gentoo_importer.py:55-188). Parsed
  * with the same XXE-hardened DOM settings as OvalIngest; range
  * attributes map through the reference's comparator table (revision
  * variants collapse onto their plain comparators). */
object GentooIngest {

  private val ComparatorByRange = Map(
    "gt" -> ">", "lt" -> "<", "ge" -> ">=", "le" -> "<=", "eq" -> "=",
    "rle" -> "<=", "rge" -> ">=", "rgt" -> ">")

  def parseOne(datasourceId: String, xml: String): Option[AdvisoryRow] = {
    val f = DocumentBuilderFactory.newInstance()
    // real GLSA files all carry `<!DOCTYPE glsa SYSTEM …>` (captured
    // gentoo_v2/glsa-*.xml), so the DOCTYPE itself must be allowed;
    // XXE stays closed by refusing to LOAD the external DTD or expand
    // external entities
    f.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities",
      false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    val doc =
      try f.newDocumentBuilder()
        .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
      catch { case _: Exception => return None }
    val root = doc.getDocumentElement
    if (root == null || root.getTagName != "glsa") return None
    val id = root.getAttribute("id")
    if (id.isEmpty) return None
    val glsa = s"GLSA-$id"

    def elems(parent: org.w3c.dom.Element, tag: String) = {
      val ns = parent.getElementsByTagName(tag)
      (0 until ns.getLength).map(_i =>
        ns.item(_i).asInstanceOf[org.w3c.dom.Element])
    }
    val summary = elems(root, "synopsis").headOption
      .map(_.getTextContent.trim).getOrElse("")
    val cves = elems(root, "references").flatMap(r => elems(r, "uri"))
      .flatMap(u => "CVE-\\d{4}-\\d{4,19}".r
        .findFirstIn(u.getTextContent.trim))
      .distinct
    val severities = elems(root, "impact")
      .map(_.getAttribute("type")).filter(_.nonEmpty).distinct
      .map(v => SeverityRow("generic_textual", v, "",
        s"https://security.gentoo.org/glsa/$id"))

    val affected = elems(root, "affected").flatMap(a => elems(a, "package"))
      .flatMap { pkg =>
        val name = pkg.getAttribute("name")
        if (name.isEmpty) Seq.empty
        else {
          val slot = (0 until pkg.getChildNodes.getLength).map(
            pkg.getChildNodes.item).collect {
            case e: org.w3c.dom.Element => e
          }.flatMap { info =>
            val comparator = ComparatorByRange.get(info.getAttribute("range"))
            val slotAttr = Option(info.getAttribute("slot"))
              .filter(_.nonEmpty)
            comparator.map { cmp =>
              val purl = "pkg:ebuild/" + name +
                slotAttr.map(s => s"?slot=$s").getOrElse("")
              val constraint = cmp + info.getTextContent.trim
              val unaffected = info.getTagName == "unaffected"
              if (unaffected)
                AffectedRow(purl, "vers:ebuild/",
                  "vers:ebuild/" + constraint)
              else
                AffectedRow(purl, "vers:ebuild/" + constraint,
                  "vers:ebuild/")
            }
          }
          slot
        }
      }

    Some(AdvisoryRow(datasourceId, glsa, summary, cves,
      Seq(ReferenceRow(s"https://security.gentoo.org/glsa/$id",
        "advisory", glsa)),
      severities, Seq.empty, affected, new Timestamp(0L), None,
      s"https://security.gentoo.org/glsa/$id", 200))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "xml").as[(String, String)]
      .flatMap { case (ds, xml) => parseOne(ds, xml) }
  }
}
