package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The exact/approx contract of [[Corpus.qualityQuantiles]]: the exact
  * twin is what the driver oracle checks; the GK-sketch default (the
  * 100 TB path — bounded per-group aggregate state) must stay within
  * sketch tolerance of it.
  */
class QualityQuantilesSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    val sp = spark
    import sp.implicits._
    // two sources with different length regimes + a heavy tail
    (1 to 3000).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val len = if (i % 97 == 0) 5000 + i else if (src == "a") 100 + i % 400
        else 300 + i % 200
      (i.toLong, src, len)
    }.toDF("doc_id", "source", "n_chars")
  }

  test("exact percentiles match a driver-side sort computation") {
    val got = Corpus.qualityQuantiles(corpus, "n_chars", "source",
        Seq(0.5), exact = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val byKey = corpus.collect()
      .map(r => r.getString(1) -> r.getInt(2)).groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.map(_._2.toDouble).sorted
      val pos = (sorted.length - 1) * 0.5
      val (lo, hi) = (sorted(pos.floor.toInt), sorted(pos.ceil.toInt))
      val want = lo + (hi - lo) * (pos - pos.floor)
      assert(math.abs(got(k) - want) < 1e-9, s"source $k")
    }
  }

  test("HLL cardinality profile stays within rsd of exact") {
    val sp = spark
    import sp.implicits._
    val docs = (1 to 2000).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      // vocab: ~700 distinct tokens for a, ~150 for b
      val toks = (0 until 6).map(j => s"w${(i * 7 + j) % (if (src == "a") 700 else 150)}")
      (i.toLong, src, toks.mkString(" "))
    }.toDF("doc_id", "source", "text")
    val exact = Corpus.cardinalityProfile(docs, "text", "source",
        "doc_id", exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Corpus.cardinalityProfile(docs, "text", "source", "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (k, (nd, nt, dt)) =>
      val (and_, ant, adt) = approx(k)
      assert(and_ == nd && ant == nt, s"$k non-sketched counts must be exact")
      // rsd 1% => generous 5% acceptance band
      assert(math.abs(adt - dt).toDouble / dt <= 0.05,
        s"$k distinct_tokens $adt vs exact $dt")
    }
  }

  test("approx sketch stays within tolerance of exact") {
    val exact = Corpus.qualityQuantiles(corpus, "n_chars", "source",
        Seq(0.5, 0.9, 0.99), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = Corpus.qualityQuantiles(corpus, "n_chars", "source",
        Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    exact.foreach { case (k, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(k)
      // accuracy=10000 ⇒ rank error ≤ n/10000; on 1500 rows the sketch
      // is effectively exact up to interpolation (≤ one value step)
      assert(math.abs(a50 - e50) <= 1.0, s"$k p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) <= 1.0, s"$k p90 $a90 vs $e90")
      assert(math.abs(a99 - e99) <= 60.0, s"$k p99 $a99 vs $e99")
    }
  }
}
