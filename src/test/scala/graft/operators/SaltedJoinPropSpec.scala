package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: [[Skew.saltedJoin]] is EXACTLY an inner equi-join — same
  * multiset of output pairs for arbitrary key multiplicities on both
  * sides (n:m, missing keys, all-one-key skew), any salt count. Spark
  * rounds are expensive, so a handful of generated cases with dense key
  * ranges (to force collisions) beats hundreds of sparse ones.
  */
class SaltedJoinPropSpec extends AnyFunSuite with SparkTestSession {

  private val factGen =
    Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0, 999)))
  private val dimGen =
    Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0, 999)))
  private val saltsGen = Gen.choose(1, 5)

  test("salted join equals plain join for arbitrary multiplicities") {
    val sp = spark
    import sp.implicits._
    val prop = Prop.forAll(factGen, dimGen, saltsGen) { (fs, ds, salts) =>
      val fact = fs.toDF("k", "f").repartition(3)
      val dim = ds.toDF("k", "d")
      val got = Skew.saltedJoin(fact, dim, "k", salts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .sorted.toSeq
      val want = fact.join(dim, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .sorted.toSeq
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
