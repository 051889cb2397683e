package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the trained quality classifier: exact-decimal
  * determinism (two trainings bit-equal), the gradient's direction
  * (exemplar-like text scores above negative-like text after two
  * steps), the first step's closed form (w0 = 0 ⇒ r = 0.5 − y, so
  * w1_j = −lr · (0.5·negPairs_j − 0.5·posPairs_j), recomputed here by
  * hand), and map-only scoring (no shuffle in the scored plan). */
class QualityClassifierSpec extends AnyFunSuite with SparkTestSession {

  private def fixture = {
    val sp = spark
    import sp.implicits._
    // ids 0..59; id % 7 == 0 are "exemplars" (curated-looking text
    // with shared vocabulary); the rest is crawl-looking filler. The
    // pseudo-negative pick is the md5 window — data-independent.
    (0L until 60L).map { id =>
      val text =
        if (id % 7 == 0) s"the curated reference corpus entry $id"
        else s"rnd${id}a spam${id}b junk${id}c filler${id}d noise$id"
      (id, text)
    }.toDF("doc_id", "text")
  }

  private val isEx = pmod(col("doc_id"), lit(7)) === 0

  test("training is deterministic: two runs return bit-equal weights") {
    val df = fixture
    val w1 = Corpus.trainQualityClassifier(df, "text", "doc_id", isEx,
      dims = 16, iters = 2, negCut = 65536)
    val w2 = Corpus.trainQualityClassifier(df, "text", "doc_id", isEx,
      dims = 16, iters = 2, negCut = 65536)
    assert(w1.length == 17)
    assert(w1.toSeq == w2.toSeq)
    // training moved: the bias weight is deterministically negative
    // here (negatives outnumber exemplars 51:9, so step 1's bias
    // gradient is +0.5·51 − 0.5·9 > 0 and w_bias steps below zero)
    assert(w1.last.signum < 0)
    assert(w1.exists(_.signum != 0))
  }

  test("step 1 matches the closed form (w0 = 0 => r = 0.5 - y)") {
    val df = fixture
    val got = Corpus.trainQualityClassifier(df, "text", "doc_id", isEx,
      dims = 8, iters = 1, negCut = 65536)
    // hand-recompute: per bucket, g = 0.5*(neg pairs) - 0.5*(pos pairs)
    val lr = new java.math.BigDecimal("0.000001")
    val half = new java.math.BigDecimal("0.5")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = Array.fill(9)(java.math.BigDecimal.ZERO)
    rows.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = toks ++ toks.zip(toks.drop(1)).map(p => s"${p._1} ${p._2}")
      val y = if (id % 7 == 0) 1 else 0
      val r = half.subtract(new java.math.BigDecimal(y))
      feats.foreach { t =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val b = (java.lang.Long.parseLong(md5.take(13), 16) % 8).toInt
        exp(b) = exp(b).add(r)
      }
      exp(8) = exp(8).add(r)
    }
    val expW = exp.map(g => java.math.BigDecimal.ZERO
      .subtract(lr.multiply(g))
      .setScale(12, java.math.RoundingMode.HALF_UP))
    assert(got.toSeq == expW.toSeq)
  }

  test("exemplar-like text scores above crawl-like text; scoring plan " +
      "is map-only") {
    val sp = spark
    import sp.implicits._
    val df = fixture
    val w = Corpus.trainQualityClassifier(df, "text", "doc_id", isEx,
      dims = 16, iters = 2, negCut = 65536,
      lr = new java.math.BigDecimal("0.0001"))
    val probes = Seq(
      (1000L, "the curated reference corpus entry"),
      (1001L, "rnd9a spam9b junk9c filler9d noise9"))
      .toDF("doc_id", "text")
    val scored = Corpus.scoreQuality(probes, "text", "doc_id", w,
      dims = 16)
    val byId = scored.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1000L) > byId(1001L),
      s"exemplar-like ${byId(1000L)} should beat crawl-like ${byId(1001L)}")
    // map-only: no exchange anywhere in the scoring plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
  }
}
