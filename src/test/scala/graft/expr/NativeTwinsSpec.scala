package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, PurlCodec, Vers, VersionOrd}
import graft.operators.SparkTestSession

/** Coherence pins between scalar domain functions and their codegen'd
  * column twins introduced by the round-13 native swap — the same
  * drift class the severity-range advice flagged: two implementations
  * of one rule must be provably the same rule.
  */
class NativeTwinsSpec extends AnyFunSuite with SparkTestSession {

  test("purlVersionScheme column map equals PurlCodec.versionScheme") {
    val sp = spark
    import sp.implicits._
    val ptypes = Seq("npm", "cargo", "composer", "hex", "gem", "golang",
      "nuget", "alpm", "ebuild", "pypi", "deb", "rpm", "maven", "apk",
      "generic", "github", "unknown-type", "swift")
    // non-canonical spellings PurlCodec.parse tolerates (trim, leading
    // slashes after pkg:, uppercase type) must derive the same scheme
    // through the column twin — the round-13 review caught the twin
    // falling back to 'generic' on these
    val nonCanonical = Seq("pkg:NPM/x", "pkg://npm/x", "pkg:///Pypi/x",
      "  pkg:deb/x@1 ", "pkg:Gem/rails@7.0.0",
      // Java String.trim strips every char <= U+0020, not just spaces
      "\tpkg:npm/x", "\npkg:rpm/x@1", "pkg:maven/g/a")
    val purls = ptypes.map(t => s"pkg:$t/x") ++ nonCanonical
    val expected = purls.map(p => PurlCodec.parse(p).versionScheme)
    val got = purls.toDF("purl")
      .select(GraftFunctions.purlVersionScheme(col("purl")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == expected)
  }

  test("version_render_native equals VersionOrd.render (eval + codegen)") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      ("apache", "0.10.2.2"), ("apache", "2.8.0."), ("apache", "1.2.3"),
      ("apache", "1.2.3.4.5"), ("semver", "1.2.3-rc1"), ("", "1.0"),
      ("APACHE", "9.8.7.6"), ("deb", "1:2.3-4"))
    val expected = cases.map { case (s, v) => VersionOrd.render(s, v) }
    // data-column path (interpreted eval + the codegen'd projection)
    val got = cases.toDF("s", "v")
      .select(call_function("version_render_native", col("s"), col("v"))
        .as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == expected)
    // constant-folded path (Catalyst evals the expression at plan time)
    val folded = sp.sql(
      "SELECT version_render_native('apache', '0.10.2.2') AS r")
      .head().getString(0)
    assert(folded == VersionOrd.render("apache", "0.10.2.2"))
  }

  test("vers endpoint natives equal the Vers scalar helpers") {
    val sp = spark
    import sp.implicits._
    val specs = Seq(
      "vers:npm/>=1.0.0|<2.0.0|!=1.5.0",
      "vers:generic/>=1|<=3|!=9",
      "vers:pypi/=1.0.0",
      "vers:semver/*",
      "not-a-spec",
      "")
    val expectedRes = specs.map(s =>
      if (s.trim.isEmpty) Seq.empty[String]
      else
        try Vers.resolvedConstraintVersions(s)
        catch { case _: Exception => Seq.empty[String] })
    val expectedExc = specs.map(s =>
      if (s.trim.isEmpty) Seq.empty[String]
      else
        try Vers.exactVersions(s)._2
        catch { case _: Exception => Seq.empty[String] })
    val rows = specs.toDF("spec")
      .select(
        call_function("vers_endpoints_native", col("spec")).as("res"),
        call_function("vers_excluded_native", col("spec")).as("exc"))
      .collect()
    assert(rows.map(_.getSeq[String](0).toList).toSeq ==
      expectedRes.map(_.toList))
    assert(rows.map(_.getSeq[String](1).toList).toSeq ==
      expectedExc.map(_.toList))
    // null spec propagates null (call sites coalesce to empty)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("spec")
      .select(call_function("vers_endpoints_native", col("spec")).as("r"))
      .head()
    assert(n.isNullAt(0))
  }
  test("rolling_window_digests_native: null element hashes as empty " +
      "string; non-array<string> input fails analysis") {
    val sp = spark
    import sp.implicits._
    // a null token and an empty-string token produce IDENTICAL window
    // digests (the documented null behavior of the registered SQL
    // function; the concat_ws path it replaced also null-tolerated)
    val withNull = Seq(Tuple1(Seq("a", null, "c", "d")))
      .toDF("toks")
      .select(call_function("rolling_window_digests_native",
        col("toks"), lit(2)).as("w"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val withEmpty = Seq(Tuple1(Seq("a", "", "c", "d")))
      .toDF("toks")
      .select(call_function("rolling_window_digests_native",
        col("toks"), lit(2)).as("w"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(withNull.nonEmpty && withNull == withEmpty)
    // wrong child type is an analysis error, not a runtime cast failure
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq(1, 2, 3))).toDF("toks")
        .select(call_function("rolling_window_digests_native",
          col("toks"), lit(2)))
        .head()
    }
    assert(err.getMessage.contains("rolling_window_digests_native") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
