package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** glibc security advisories ingestion (S2): GLIBC-SA text files with
  * summary / description paragraphs and `Name: value` metadata, where
  * Vulnerable-Commit / Fix-Commit lines carry `<sha> (<version>)`
  * (pipelines/v2_importers/glibc_importer.py:56-178). */
object GlibcIngest {

  private val GlibcPurl = "pkg:sid/gnu.org/glibc"
  private val VcsUrl = "https://sourceware.org/git/glibc.git"

  /** Generic-scheme version normalization (univers GenericVersion, as
    * captured in the glibc advisories expected JSON): the numeric dotted
    * base pads to three segments, any `-suffix` is preserved —
    * `2.37` → `2.37.0`, `2.37-4` → `2.37.0-4`. */
  def genericVersion(v: String): String = {
    val dash = v.indexOf('-')
    val (base, suffix) = if (dash < 0) (v, "") else v.splitAt(dash)
    val segs = base.split('.')
    if (segs.nonEmpty && segs.forall(s => s.nonEmpty && s.forall(_.isDigit)))
      (segs ++ Seq.fill(3 - segs.length)("0")).take(3).mkString(".") + suffix
    else v
  }

  def parseOne(datasourceId: String, fileName: String,
      text: String): Option[AdvisoryRow] = {
    if (!fileName.startsWith("GLIBC-SA")) return None
    val firstSplit = text.indexOf("\n\n")
    val (summary, tail) =
      if (firstSplit < 0) (text.trim, "")
      else (text.substring(0, firstSplit).trim, text.substring(firstSplit + 2))
    val secondSplit = tail.indexOf("\n\n")
    val (description, metadata) =
      if (secondSplit < 0) (tail.trim, "")
      else (tail.substring(0, secondSplit).trim,
        tail.substring(secondSplit + 2))

    var cve: Option[String] = None
    var published: Option[Timestamp] = None
    var affectedCommits = Vector.empty[(String, String)]
    var fixedCommits = Vector.empty[(String, String)]
    metadata.split('\n').foreach { line =>
      val i = line.indexOf(": ")
      if (i > 0) {
        val (name, value) = (line.substring(0, i), line.substring(i + 2))
        if (name.endsWith("Commit") || name.endsWith("Backport")) {
          val j = value.indexOf(' ')
          val (commit, version) =
            if (j < 0) (value, "")
            else (value.substring(0, j),
              value.substring(j + 1).replaceAll("^[()]+|[()]+$", ""))
          if (name == "Vulnerable-Commit")
            affectedCommits :+= (commit, version)
          else if (name == "Fix-Commit") fixedCommits :+= (commit, version)
        } else if (name == "CVE-Id") cve = Some(value.trim)
        else if (name == "Public-Date") {
          published =
            try Some(Timestamp.valueOf(
              java.time.LocalDate.parse(value.trim.take(10)).atStartOfDay()))
            catch { case _: Exception => None }
        }
      }
    }
    val affVersions = affectedCommits.map(_._2).filter(_.nonEmpty)
      .map(genericVersion).distinct
    val fixVersions = fixedCommits.map(_._2).filter(_.nonEmpty)
      .map(genericVersion).distinct
    val affected =
      if (affVersions.isEmpty && fixVersions.isEmpty) Seq.empty
      else Seq(AffectedRow(GlibcPurl,
        "vers:generic/" + affVersions.sorted.map("=" + _).mkString("|"),
        "vers:generic/" + fixVersions.sorted.map("=" + _).mkString("|")))
    // directed commit references — our flat analog of the reference's
    // introduced_by/fixed_by_commit_patches on AffectedPackageV2
    // (glibc_importer.py:119-130); the url is the bare VCS url like the
    // reference's PackageCommitPatchData.vcs_url
    val commitRefs =
      affectedCommits.map(_._1).filter(_.nonEmpty).distinct.map(h =>
        ReferenceRow(VcsUrl, "vulnerable_commit", h)) ++
      fixedCommits.map(_._1).filter(_.nonEmpty).distinct.map(h =>
        ReferenceRow(VcsUrl, "fix_commit", h))

    Some(AdvisoryRow(datasourceId, fileName,
      (summary + "\n" + description).trim, cve.toSeq, commitRefs,
      Seq.empty, Seq.empty, affected,
      published.getOrElse(new Timestamp(0L)), published,
      VcsUrl, 200))
  }

  def parse(spark: SparkSession, raw: DataFrame): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "path", "text").as[(String, String, String)]
      .flatMap { case (ds, path, text) =>
        parseOne(ds, path.split('/').last, text)
      }
  }
}
