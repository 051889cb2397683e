package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Coherence property: the scalar [[Cvss.severityRange]] (pinned on the
  * reference doctests) and the codegen'd column twin
  * `Serving.severityRangeCol` (oracled as a14) agree on arbitrary
  * mixed word/numeric severity lists — the realistic value domain:
  * bucket words in any case, unknown words, and numeric scores. Both
  * sides share one numeric grammar (Cvss.NumericScoreRe — Python
  * float() literals minus inf/nan) and one low-bucket int-3 rendering
  * rule, so the generators include signed/exponent spellings and the
  * bare "3".
  */
class SeverityRangePropSpec extends AnyFunSuite with SparkTestSession {

  private val wordGen = Gen.oneOf(
    "low", "LOW", "Low", "moderate", "Medium", "medium", "high",
    "Important", "critical", "CRITICAL", "unknown", "none", "urgent")
  private val numGen = Gen.frequency(
    6 -> (for {
      a <- Gen.choose(0, 10)
      b <- Gen.choose(0, 9)
    } yield s"$a.$b"),
    1 -> Gen.oneOf("3", "3.0", "-2", "+4.5", "1e1", ".5", "7.",
      // negative zero keeps its sign in str(float); overflow spellings
      // parse to inf in Python but drop in ALL graft twins (documented
      // finite-only rule); finite large-exponent spellings (>= 1e16)
      // drop by the shared clamp (Python "1e+17" vs Spark "1.0E17"
      // rendering split); control-char padding exercises the Java-trim
      // parity rule (tab/newline strip in BOTH twins)
      "-0", "-0.0", "1e999", "-1e999", "1e17", "-2E16", "9.9e15",
      "\t3.5", "4.5\n", " 6.1\t", "\u000BHigh\n"))
  private val valuesGen: Gen[List[String]] =
    Gen.listOfN(6, Gen.frequency(2 -> wordGen, 3 -> numGen))
      .flatMap(l => Gen.choose(0, 6).map(n => l.take(n)))

  test("scalar and column severity ranges agree on the shared domain") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val prop = Prop.forAll(Gen.listOfN(12, valuesGen)) { lists =>
      val expected = lists.map(l => Cvss.severityRange(l).orNull)
      val got = lists.zipWithIndex
        .map { case (l, i) => (i, l) }
        .toDF("i", "values")
        .select(col("i"),
          graft.serve.Serving.severityRangeCol(col("values")).as("r"))
        .collect().sortBy(_.getInt(0)).map(_.getString(1)).toList
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
