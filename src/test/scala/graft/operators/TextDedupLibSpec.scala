package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupLibSpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
      (4L, "completely different content about spark engines"),
      (5L, "spark engines process completely different content"))
      .toDF("id", "text")
  }

  test("exact dedup flags later duplicates") {
    val out = TextDedup.exact(docs, "text", "id")
      .select("id", "is_duplicate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> false,
      5L -> false))
  }

  test("ngram jaccard finds the near-dup pair, not unrelated docs") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "text", "id",
      n = 2, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L))
  }

  test("minhash LSH estimates similarity and exact dups score 1.0") {
    // 8 bands x 2 rows: collision probability for jaccard 0.6 is
    // 1-(1-0.36)^8 ≈ 0.97 (4x4 banding would miss ~57% of 0.6-pairs)
    val pairs = TextDedup.minHashLshPairs(docs, "text", "id",
      n = 2, numHashes = 16, bands = 8, threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs(( 1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)))
    assert(pairs((1L, 3L)) < 1.0 && pairs((1L, 3L)) > 0.3)
  }

  test("simhash: identical docs equal, near dups within small hamming") {
    val hashes = TextDedup.simHash(docs, "text", "id", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    val hamming13 = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    val hamming14 = java.lang.Long.bitCount(hashes(1L) ^ hashes(4L))
    assert(hamming13 < hamming14)
  }
}
