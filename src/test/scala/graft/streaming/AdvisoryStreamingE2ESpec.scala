package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.derive.AdvisoryDerive
import graft.operators.SparkTestSession

/** End-to-end incremental advisory pipeline (T2/T4): two
  * Trigger.AvailableNow passes over a GROWING file directory must land
  * on exactly the marts the batch run over all files computes, with the
  * change stream's state store surviving between passes (an advisory
  * updated between passes emits `update`, not a second `import`). */
class AdvisoryStreamingE2ESpec extends AnyFunSuite with SparkTestSession {

  private val fixture = "src/test/resources/fixtures/advisories/pypa"

  test("two AvailableNow passes over a growing directory equal the batch run") {
    val sp = spark
    sp.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("adv-e2e")
    val input = Files.createDirectory(root.resolve("input"))
    val logDir = root.resolve("log").toString
    val changeDir = root.resolve("changes").toString
    val ckpt = root.resolve("ckpt").toString

    // pass 1: one advisory file
    Files.copy(Paths.get(s"$fixture/PYSEC-2021-9.json"),
      input.resolve("PYSEC-2021-9.json"))
    AdvisoryStreaming.runAvailableNow(sp, input.toString, "pypa",
      logDir, changeDir, ckpt)
    assert(sp.read.parquet(logDir).count() == 1)
    val changes1 = sp.read.parquet(changeDir)
      .select("avid", "action_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(changes1 == Seq(("pypa/PYSEC-2021-9", "import")))

    // pass 2: a new advisory arrives AND the first one is re-collected
    // with changed content at a later date
    Files.copy(Paths.get(s"$fixture/PYSEC-2022-1.json"),
      input.resolve("PYSEC-2022-1.json"))
    val v1 = new String(Files.readAllBytes(
      Paths.get(s"$fixture/PYSEC-2021-9.json")), "UTF-8")
    val v2 = v1
      .replace("1-byte memory overwrite in resolver",
        "1-byte memory overwrite in resolver (revised)")
      .replace("\"date_published\": \"2021-05-25T00:00:00+00:00\"",
        "\"date_published\": \"2021-06-25T00:00:00+00:00\"")
    assert(v2 != v1, "fixture edit must change content and date")
    Files.write(input.resolve("PYSEC-2021-9-v2.json"), v2.getBytes("UTF-8"))
    AdvisoryStreaming.runAvailableNow(sp, input.toString, "pypa",
      logDir, changeDir, ckpt)

    // the log accumulated every version exactly once
    val log = sp.read.parquet(logDir)
    assert(log.count() == 3)

    // marts from the log == batch derivation over the full directory
    def key(df: org.apache.spark.sql.DataFrame) =
      AdvisoryDerive.withContentIdAndLatest(df)
        .select("avid", "unique_content_id", "is_latest")
        .collect().map(r =>
          (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    val streamed = key(log)
    val batch = key(graft.ingest.AdvisoryJsonIngest
      .readTree(sp, input.toString, "pypa").toDF())
    assert(streamed == batch)
    // the revised version is the latest for its avid
    val latest = AdvisoryDerive.withContentIdAndLatest(log)
      .filter(col("is_latest") && col("avid") === "pypa/PYSEC-2021-9")
      .select("summary").collect().map(_.getString(0)).toSeq
    assert(latest == Seq("1-byte memory overwrite in resolver (revised)"))
    // downstream derive over the log works unchanged (impacts mart)
    val impacts = AdvisoryDerive.impacts(
      AdvisoryDerive.withContentIdAndLatest(log))
    assert(impacts.filter(col("avid") === "pypa/PYSEC-2022-1").count() == 1)

    // change stream state survived the restart: update, not re-import
    val changes2 = sp.read.parquet(changeDir)
      .orderBy("action_time", "avid")
      .select("avid", "action_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // ordered by action_time (= date_collected): the June revision sits
    // between the two imports
    assert(changes2 == Seq(
      ("pypa/PYSEC-2021-9", "import"),
      ("pypa/PYSEC-2021-9", "update"),
      ("pypa/PYSEC-2022-1", "import")))
  }
}
