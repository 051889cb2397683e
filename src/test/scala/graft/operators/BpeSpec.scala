package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTestSession {

  // the Sennrich et al. 2016 worked example: low×5 lower×2 newest×6
  // widest×3
  private def corpus = {
    val sp = spark
    import sp.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("train learns the hand-computed merge table, ties by pair bytes") {
    val got = Bpe.train(corpus, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // round 1: (e,s) and (s,t) tie at 9 → lexicographically first wins;
    // round 2: the merged "es" symbol pairs with t at 9;
    // round 3: (l,o) beats (o,w) on bytes at 7
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L)))
  }

  test("applyMerge is left-to-right non-overlapping (aaa → [aa, a])") {
    val sp = spark
    import sp.implicits._
    val out = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a")),
      Tuple1(Seq("b", "a", "a", "a", "b")))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), lit("a"), lit("a")).as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("aa", "a"))       // greedy: first pair consumed
    assert(out(1) == List("a"))             // single symbol untouched
    assert(out(2) == List("b", "aa", "a", "b"))
    // empty symbol array passes through (no ANSI out-of-bounds)
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), lit("a"), lit("a")).as("m"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("segment applies merges in order to completion (lowest)") {
    val sp = spark
    import sp.implicits._
    val vocab = Seq(Tuple1("lowest")).toDF("word")
      .select(Bpe.charSymbols(col("word")).as("syms"))
    val got = Bpe.segment(vocab, Seq("e" -> "s", "es" -> "t", "l" -> "o"))
      .head().getSeq[String](0).toList
    assert(got == List("lo", "w", "est"))
  }

  test("pairCounts weights by word frequency and skips 1-char words") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "ab ab a b")).toDF("doc_id", "text")
    val vocab = Bpe.wordCounts(docs, "text")
      .select(col("wc"), Bpe.charSymbols(col("word")).as("syms"))
    val pc = Bpe.pairCounts(vocab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc == Map(("a", "b") -> 2L))     // "a"/"b" words carry no pairs
  }
}
