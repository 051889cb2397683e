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

  test("native scoring (qc_buckets/qc_z) equals the HOF formulation " +
      "bit-for-bit on edge cases") {
    val sp = spark
    import sp.implicits._
    val dims = 16
    // hand-built scale-12 weights, mixed signs, bias last
    val w = (0 to dims).map(j => new java.math.BigDecimal(j - 8)
      .multiply(new java.math.BigDecimal("0.000321000045"))
      .setScale(12, java.math.RoundingMode.HALF_UP)).toArray
    val probes = Seq[(java.lang.Long, String)](
      (1L, "the curated reference corpus entry"),
      (2L, ""),                      // empty → zero tokens → bias-only z
      (3L, "   \t  "),               // whitespace-only → zero tokens
      (4L, "single"),                // one token → no bigrams
      (5L, null),                    // null text → null tokens → coalesce
      (6L, "héllo wörld ünïcode 测试 токен"), // multi-byte UTF-8 md5
      (7L, ("tok " * 200).trim))     // long doc: 200 unigrams + bigrams
      .toDF("doc_id", "text")
    val native = Corpus.scoreQuality(probes, "text", "doc_id", w,
        dims = dims)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // the pre-native HOF formulation, inlined verbatim
    val wArr = array(w.init.map(v => lit(v).cast("decimal(20,12)")): _*)
    val toks = coalesce(Corpus.tokens(col("text")), array())
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    val bk = transform(concat(toks, bigrams), t =>
      conv(substring(md5(t), 1, 13), 16, 10).cast("long") % dims)
    val zero = new java.math.BigDecimal("0.000000000000")
    val z = (aggregate(bk, lit(zero).cast("decimal(20,12)"),
      (acc, b) => (acc + element_at(wArr, (b + 1).cast("int")))
        .cast("decimal(20,12)"))
      + lit(w.last).cast("decimal(20,12)")).cast("decimal(20,12)")
    val zq = z * lit(new java.math.BigDecimal("0.25"))
    val sig = least(greatest(lit(new java.math.BigDecimal("0.5")) + zq,
      lit(0).cast("decimal(24,14)")), lit(1).cast("decimal(24,14)"))
    val hof = probes.select(col("doc_id"),
        round(sig.cast("double"), 6).as("score"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(native == hof, s"native $native != HOF $hof")
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
