package graft.ingest

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** S1 — OSV directory-tree scan: one JSON file per advisory, read as a
  * single distributed wholetext scan. */
class OsvTreeSpec extends AnyFunSuite with SparkTestSession {
  test("readTree parses a checkout of per-advisory JSON files") {
    val dir = Files.createTempDirectory("osvtree")
    Files.writeString(dir.resolve("PYSEC-1.json"),
      """{"id":"PYSEC-1","summary":"bug one","aliases":["CVE-1"],
        |"modified":"2024-01-01T00:00:00Z",
        |"affected":[{"package":{"ecosystem":"PyPI","name":"a","purl":"pkg:pypi/a"},
        |"ranges":[{"type":"ECOSYSTEM","events":[{"introduced":"0"},{"fixed":"1.2"}]}]}]}"""
        .stripMargin.replaceAll("\n", ""))
    Files.writeString(dir.resolve("PYSEC-2.json"),
      """{"id":"PYSEC-2","summary":"bug two","aliases":[],
        |"modified":"2024-01-02T00:00:00Z","affected":[]}"""
        .stripMargin.replaceAll("\n", ""))
    val rows = OsvIngest.readTree(spark, dir.toString, "pypa").collect()
    assert(rows.map(_.advisory_id).sorted.toSeq == Seq("PYSEC-1", "PYSEC-2"))
    val a = rows.find(_.advisory_id == "PYSEC-1").get
    // `introduced: "0"` contributes nothing (osv_v2.py:491-493)
    assert(a.affected.head.affecting_vers == "vers:pypi/<1.2")
    assert(a.aliases == Seq("CVE-1"))
    assert(a.avid == "pypa/PYSEC-1")
  }
}
