package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of [[Bpe.applyMerge]] against a direct list-walk reference:
  * the fold must be EXACTLY reference BPE's left-to-right non-overlapping
  * merge for arbitrary symbol sequences and pairs (including a == b,
  * multi-char symbols from earlier merges, and symbols that embed the
  * pair as a substring), preserve concatenation, and leave no adjacent
  * (a, b) behind. Spark rounds are expensive — a few dense generated
  * batches over a 2-letter alphabet (maximal collision pressure) beat
  * hundreds of sparse ones, so each Spark job checks a whole batch of
  * generated words at once.
  */
class BpePropSpec extends AnyFunSuite with SparkTestSession {

  /** Reference: textbook left-to-right non-overlapping merge. */
  private def refMerge(syms: List[String], a: String,
      b: String): List[String] = {
    @annotation.tailrec
    def go(rest: List[String], acc: List[String]): List[String] =
      rest match {
        case x :: y :: t if x == a && y == b => go(t, (a + b) :: acc)
        case x :: t                          => go(t, x :: acc)
        case Nil                             => acc
      }
    go(syms, Nil).reverse
  }

  // symbols over {a, b}: single chars plus the merged forms one or two
  // earlier rounds could have produced (multi-char, pair-embedding)
  private val symGen = Gen.oneOf("a", "b", "ab", "ba", "aa", "aab")
  private val wordGen = Gen.listOfN(8, Gen.resize(6, Gen.listOf(symGen)))
  private val pairGen = Gen.zip(symGen, symGen)

  test("applyMerge equals the reference walk; concatenation preserved") {
    val sp = spark
    import sp.implicits._
    val prop = Prop.forAll(wordGen, pairGen) { case (words, (a, b)) =>
      val got = words.map(_.toSeq).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), lit(a), lit(b)).as("m"))
        .collect().map(_.getSeq[String](0).toList).toList
      val want = words.map(w => refMerge(w, a, b))
      val concatOk = got.zip(words)
        .forall { case (m, w) => m.mkString == w.mkString }
      val noPairLeft = got.forall(m =>
        !m.zip(m.drop(1)).contains((a, b)))
      got == want && concatOk && noPairLeft
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
