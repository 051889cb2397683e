package graft.ingest

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** OVAL XML advisory ingestion (SURVEY S3).
  *
  * The reference vendors a 1.3k-line OVAL DOM wrapper (lib_oval.py) plus
  * oval_parser.py; here the XML work happens inside `mapPartitions` with
  * the JDK's namespace-aware DOM parser (files are small; one document per
  * row), emitting flat definition rows that downstream jobs join/explode —
  * the distributed scan is the Spark part, the per-document parse is
  * sequential just like the reference's.
  */
object OvalIngest {

  final case class OvalDefinition(
      datasource_id: String,
      definition_id: String,
      title: String,
      severity: String,
      cves: Seq[String],
      fixed_versions: Seq[String])

  /** Parse one OVAL XML document into definition rows. Secure parser
    * settings: DTDs and external entities disabled. */
  def parseDocument(datasourceId: String, xml: String): Seq[OvalDefinition] = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    val doc = f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
    val defs = doc.getElementsByTagNameNS("*", "definition")
    val out = ArrayBuffer.empty[OvalDefinition]
    for (i <- 0 until defs.getLength) {
      val d = defs.item(i).asInstanceOf[org.w3c.dom.Element]
      def texts(tag: String): Seq[String] = {
        val ns = d.getElementsByTagNameNS("*", tag)
        (0 until ns.getLength).map(j => ns.item(j).getTextContent.trim)
      }
      def attr(tag: String, a: String): Seq[String] = {
        val ns = d.getElementsByTagNameNS("*", tag)
        (0 until ns.getLength)
          .map(j => ns.item(j).asInstanceOf[org.w3c.dom.Element].getAttribute(a))
          .filter(_.nonEmpty)
      }
      out += OvalDefinition(
        datasource_id = datasourceId,
        definition_id = d.getAttribute("id"),
        title = texts("title").headOption.getOrElse(""),
        severity = texts("severity").headOption.getOrElse(""),
        cves = (attr("reference", "ref_id") ++ texts("cve"))
          .filter(_.startsWith("CVE-")).distinct,
        // criterion comments like "... is earlier than 1.2.3"
        fixed_versions = attr("criterion", "comment")
          .flatMap(c => "earlier than ([0-9][^ ]*)".r
            .findFirstMatchIn(c).map(_.group(1))).distinct)
    }
    out.toSeq
  }

  /** Distributed parse of (datasource_id, xml) rows. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[OvalDefinition] = {
    import spark.implicits._
    raw.select("datasource_id", "xml").as[(String, String)]
      .mapPartitions(_.flatMap { case (ds, xml) => parseDocument(ds, xml) })
  }
}
