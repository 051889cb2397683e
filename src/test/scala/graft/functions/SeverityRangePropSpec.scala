package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Coherence property: the scalar [[Cvss.severityRange]] (pinned on the
  * reference doctests) and the codegen'd column twin
  * `Serving.severityRangeCol` (oracled as a14) agree on arbitrary
  * mixed word/numeric severity lists — the realistic value domain:
  * bucket words in any case, unknown words, and plain decimal scores.
  * (Scientific notation parses scalar-side like Python float but is
  * excluded column-side by the decimal regexp; no severity source
  * emits it, and the generators stay in the shared domain.)
  */
class SeverityRangePropSpec extends AnyFunSuite with SparkTestSession {

  private val wordGen = Gen.oneOf(
    "low", "LOW", "Low", "moderate", "Medium", "medium", "high",
    "Important", "critical", "CRITICAL", "unknown", "none", "urgent")
  private val numGen = for {
    a <- Gen.choose(0, 10)
    b <- Gen.choose(0, 9)
  } yield s"$a.$b"
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
