package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-archival state machine (v2_improvers/archive_urls.py:28-60):
  * AdvisoryReference rows carry an `archive_url` column that is null
  * (never attempted), a web-archive URL, or the NO_ARCHIVE sentinel
  * (attempted, nothing found). The web-archive FETCH itself is a network
  * ingestion boundary and stays outside the engine (like every fetch);
  * the data ops — selecting what to archive and folding fetch results
  * back in — are here.
  */
object ReferenceArchive {

  /** The attempted-but-unarchivable sentinel (archive_urls.py:43-45). */
  val NoArchive = "NO_ARCHIVE"

  private def pendingFlag =
    col("archive_url").isNull &&
      col("url").isNotNull && col("url").startsWith("http")

  /** The unarchived-references selection (archive_urls.py:30-40): rows
    * never attempted (null archive_url — the NO_ARCHIVE exclude is
    * implied by the null test) whose url is fetchable (http...). Rows
    * with a non-http url are skipped by the improver loop and stay
    * pending here too. */
  def pendingArchive(references: DataFrame): DataFrame =
    references.filter(pendingFlag)

  /** Fold a fetch round's results back into the references table.
    * `fetched` holds one row per ATTEMPTED url: (url, archive_url) with
    * a null archive_url when the archive lookup found nothing — those
    * rows get the NO_ARCHIVE sentinel (archive_urls.py:41-49), found
    * ones get their archive URL. Unattempted rows and rows that already
    * have a state keep it. The fetch round is bounded (an API-batch of
    * URLs), so it broadcasts. */
  def applyArchiveResults(references: DataFrame,
      fetched: DataFrame): DataFrame = {
    val f = fetched.select(col("url"),
      col("archive_url").as("_fetched"), lit(true).as("_attempted"))
    references.join(broadcast(f), Seq("url"), "left")
      .withColumn("archive_url",
        when(pendingFlag && coalesce(col("_attempted"), lit(false)),
          coalesce(col("_fetched"), lit(NoArchive)))
          .otherwise(col("archive_url")))
      .drop("_fetched", "_attempted")
  }
}
