package graft.derive

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ssvc
import graft.model._
import graft.operators.SparkTestSession
import graft.serve.Serving

/** SSVC decision mart + PackageCommitPatch mart
  * (collect_ssvc_trees.py, models.py:4051-4071, models.py:2892-2924). */
class SsvcPatchSpec extends AnyFunSuite with SparkTestSession {

  private def adv(ds: String, id: String, aliases: Seq[String],
      sevs: Seq[SeverityRow], refs: Seq[ReferenceRow] = Seq.empty) =
    AdvisoryRow(ds, id, s"summary of $id", aliases, refs, sevs,
      Seq.empty, Seq.empty,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None,
      s"https://src.example/$id", 10)

  private lazy val advisories = {
    val sp = spark
    import sp.implicits._
    val ssvcVector = "SSVCv2/E:A/A:Y/T:T/P:E/B:A/M:H/D:C/"
    AdvisoryDerive.withContentIdAndLatest(Seq(
      // vulnrichment-style source advisory carrying the ssvc severity
      adv("vulnrichment", "CVE-2024-500",
        Seq.empty,
        Seq(SeverityRow("ssvc", null, ssvcVector, ""))),
      // related via alias
      adv("ghsa", "GHSA-rrrr",
        Seq("CVE-2024-500"),
        Seq.empty,
        Seq(ReferenceRow(
          "https://github.com/org/repo/commit/aabbccddeeff00112233",
          "patch", "aabbccddeeff00112233"))),
      // unrelated
      adv("ghsa", "GHSA-ssss", Seq("CVE-2024-600"), Seq.empty))
      .toDF()).cache()
  }

  test("ssvc vector round-trip: parseVector inverts vector letters (F13)") {
    assert(Ssvc.parseVector("SSVCv2/E:A/A:Y/T:T/P:E/B:A/M:H/D:C/") ==
      Some((Seq("Exploitation" -> "active", "Automatable" -> "yes",
        "Technical Impact" -> "total", "Mission Prevalence" -> "essential",
        "Public Well-being Impact" -> "material",
        "Mission & Well-being" -> "high"), "Act")))
    // Track* letter is R per the reference's REVERSE_DECISION
    assert(Ssvc.vector("poc", "no", "total", "medium").endsWith("D:R/"))
    assert(Ssvc.parseVector("SSVCv2/E:N/A:N/T:P/D:R/").get._2 == "Track*")
    assert(Ssvc.parseVector("garbage").isEmpty)
    assert(Ssvc.parseVector("SSVCv2/E:A/").isEmpty) // no decision
  }

  test("ssvc mart: decisions parsed, relations via alias, serving nests") {
    val ssvc = AdvisoryDerive.ssvcDecisions(advisories)
    val rows = ssvc.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("source_avid") == "vulnrichment/CVE-2024-500")
    assert(r.getAs[String]("decision") == "Act")
    val opts = r.getAs[scala.collection.Seq[Row]]("options")
      .map(o => o.getAs[String]("name") -> o.getAs[String]("value")).toMap
    assert(opts("Exploitation") == "active")
    assert(opts("Mission & Well-being") == "high")

    val rel = AdvisoryDerive.ssvcRelations(advisories, ssvc).collect()
      .map(x => x.getString(0) -> x.getString(1))
    // GHSA-rrrr relates through the CVE alias; the source itself and the
    // unrelated advisory do not appear
    assert(rel.toSeq == Seq("ghsa/GHSA-rrrr" -> "vulnrichment/CVE-2024-500"))

    val served = Serving.advisorySsvc(advisories, ssvc,
      AdvisoryDerive.ssvcRelations(advisories, ssvc))
      .collect().map(x => x.getAs[String]("avid") ->
        (x.getAs[scala.collection.Seq[Row]]("related_ssvcs"), x.getAs[scala.collection.Seq[Row]]("source_ssvcs")))
      .toMap
    val (rrrrRelated, rrrrSource) = served("ghsa/GHSA-rrrr")
    assert(rrrrRelated.length == 1 && rrrrSource.isEmpty)
    assert(rrrrRelated.head.getAs[String]("decision") == "Act")
    assert(rrrrRelated.head.getAs[String]("source_url") ==
      "https://src.example/CVE-2024-500")
    val (srcRelated, srcSource) = served("vulnrichment/CVE-2024-500")
    assert(srcRelated.isEmpty && srcSource.length == 1)
    assert(served("ghsa/GHSA-ssss")._1.isEmpty)
  }

  test("commit patch mart: harvest + sha512 checksum (D10 extension)") {
    val sp = spark
    import sp.implicits._
    val patchText = "--- a/f\n+++ b/f\n@@ -1 +1 @@\n-x\n+y\n"
    val patches = Seq(
      ("https://github.com/org/repo", "aabbccddeeff00112233", patchText))
      .toDF("vcs_url", "commit_hash", "patch_text")
    val mart = AdvisoryDerive.commitPatches(advisories, patches).collect()
    assert(mart.length == 1)
    val p = mart.head
    assert(p.getAs[String]("vcs_url") == "https://github.com/org/repo")
    assert(p.getAs[String]("commit_hash") == "aabbccddeeff00112233")
    assert(p.getAs[scala.collection.Seq[String]]("avids").toSeq == Seq("ghsa/GHSA-rrrr"))
    // compute_patch_checksum (utils.py:866-870) = hex sha512 of the text
    val expected = java.security.MessageDigest.getInstance("SHA-512")
      .digest(patchText.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(p.getAs[String]("patch_checksum") == expected)

    // commit ref with no donor text -> row kept, checksum null
    val bare = AdvisoryDerive.commitPatches(advisories,
      Seq.empty[(String, String, String)]
        .toDF("vcs_url", "commit_hash", "patch_text")).collect()
    assert(bare.length == 1 && bare.head.getAs[String]("patch_checksum") == null)
  }
}
