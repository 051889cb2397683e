package graft.ingest

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** SUSE CVSS scores ingestion (S2): one YAML document mapping CVE ids to
  * per-version CVSS score+vector lists
  * (pipelines/v2_importers/suse_score_importer.py:20-80). A pure severity
  * feed — advisories carry only severities and relate to the rest of the
  * corpus through AdvisoryDerive.relateSeverities (J11) by CVE id.
  */
object SuseScoreIngest {

  private val FeedUrl =
    "https://ftp.suse.com/pub/projects/security/yaml/suse-cvss-scores.yaml"

  /** YAML version token → scoring system id (suse_score_importer.py:43-48;
    * snakeyaml renders 2.0/3/3.1/4 exactly as those strings). */
  private val SystemByVersion = Map(
    "2.0" -> "cvssv2", "3" -> "cvssv3", "3.1" -> "cvssv3.1", "4" -> "cvssv4")

  private def str(v: Object): String = Option(v).map(String.valueOf).orNull

  def parseOne(yaml: org.yaml.snakeyaml.Yaml, datasourceId: String,
      text: String): Seq[AdvisoryRow] = {
    val doc = (try yaml.load[Object](text)
      catch { case _: Exception => null }) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case _ => return Seq.empty
    }
    doc.asScala.toSeq.map { case (cveId, v) =>
      val cvssList = v match {
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Object]].get("cvss") match {
            case l: java.util.List[_] =>
              l.asScala.toSeq.collect {
                case e: java.util.Map[_, _] =>
                  e.asInstanceOf[java.util.Map[String, Object]]
              }
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
      val severities = cvssList.flatMap { e =>
        for {
          system <- SystemByVersion.get(
            Option(str(e.get("version"))).getOrElse(""))
          score <- Option(str(e.get("score")))
          vector <- Option(str(e.get("vector")))
        } yield SeverityRow(system, score, vector, FeedUrl)
      }
      AdvisoryRow(
        datasource_id = datasourceId,
        advisory_id = cveId,
        summary = "",
        aliases = Seq.empty,
        references = Seq.empty,
        severities = severities,
        weaknesses = Seq.empty,
        affected = Seq.empty,
        date_collected = new Timestamp(0L),
        date_published = None,
        url = FeedUrl,
        precedence = 200)
    }
  }

  /** Parse a DataFrame of (datasource_id, yaml) whole documents. */
  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "yaml").as[(String, String)]
      .mapPartitions { it =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        it.flatMap { case (ds, text) => parseOne(yaml, ds, text) }
      }
  }

  /** Severity-donor rows for relateSeverities (J11): one donor per
    * (CVE, scoring system) with the numeric score. */
  def donors(advisories: Dataset[AdvisoryRow]): DataFrame = {
    import org.apache.spark.sql.functions._
    advisories.toDF()
      .select(concat(col("datasource_id"), lit("/"), col("advisory_id"))
        .as("donor_id_base"), col("advisory_id"),
        explode(col("severities")).as("s"))
      .select(
        concat(col("donor_id_base"), lit("#"), col("s.scoring_system"))
          .as("donor_id"),
        col("advisory_id").as("match_key"),
        col("s.scoring_system").as("scoring_system"),
        col("s.value").cast("double").as("score"),
        col("s.scoring_elements").as("scoring_elements"))
  }
}
