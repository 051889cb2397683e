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

  test("prefix-filtered jaccard join equals the naive join (exactness)") {
    val sp = spark
    import sp.implicits._
    // varied set sizes and overlap levels around the threshold, plus a
    // seeded generator so sets share a skewed shingle distribution —
    // the regime where a broken prefix length silently drops pairs
    val rnd = new scala.util.Random(7)
    val seeds = (0 until 8).map(k =>
      (0 until 8 + rnd.nextInt(6)).map(_ => s"w${rnd.nextInt(18)}"))
    // 5 mutated variants per seed text: drop/append a few words so
    // pairs land above AND below each threshold
    val base = seeds.zipWithIndex.flatMap { case (words, k) =>
      (0 until 5).map { v =>
        val kept = words.drop(rnd.nextInt(3))
        val extra = (0 until rnd.nextInt(3)).map(_ => s"x${rnd.nextInt(9)}")
        ((k * 5 + v + 1).toLong, (kept ++ extra).mkString(" "))
      }
    }
    val df = base.toDF("id", "text")
    val sh = TextDedup.shingles(df, "text", "id", 2)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = TextDedup.ngramJaccardPairs(df, "text", "id",
        threshold = t, maxDf = Int.MaxValue)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val prefix = TextDedup.ngramJaccardPairsPrefix(sh, "id", "shingle",
        threshold = t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prefix == naive, s"threshold $t")
      assert(naive.nonEmpty, s"degenerate fixture at $t")
    }
  }

  test("positional filter keeps a just-above-threshold pair (bound math)") {
    val sp = spark
    import sp.implicits._
    // controlled dfs: A and B share 9 of 10 shingles (J = 9/11 = 0.818,
    // just over t = 0.8 which needs overlap >= ceil(20·0.8/1.8) = 9);
    // their rarest-first prefixes meet at skewed positions, so an
    // overly-aggressive positional upper bound would prune the TRUE
    // pair before verify. C shares 8 with A (J = 0.67) and must drop.
    val rows =
      ((1 to 8).map(i => (1L, s"t$i")) ++ Seq((1L, "t9"), (1L, "t10")) ++
        (1 to 8).map(i => (2L, s"t$i")) ++ Seq((2L, "t9"), (2L, "u1")) ++
        (1 to 8).map(i => (3L, s"t$i")) ++ Seq((3L, "v1"), (3L, "v2")))
        .toDF("id", "shingle")
    val got = TextDedup.ngramJaccardPairsPrefix(rows, "id", "shingle",
      threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("jaccard"))).toSet
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(math.abs(got.head._3 - 9.0 / 11.0) < 1e-12)
  }

  test("collapsed LSH pairs cluster identically to the plain pair join") {
    val sp = spark
    import sp.implicits._
    // heavy verbatim replication: each base text appears 6×, the shape
    // where the plain pair join goes O(copies²) and the collapse must
    // stay connectivity-equivalent
    val replicated = (0 until 6).flatMap(i =>
      Seq(
        (i * 10L + 1, "the quick brown fox jumps over the lazy dog"),
        (i * 10L + 2, "the quick brown fox jumps over the sleepy dog"),
        (i * 10L + 3, s"unique filler document number $i with own words")))
      .toDF("id", "text").withColumn("q", length(col("text")))
    def clusters(pairs: org.apache.spark.sql.DataFrame) =
      Corpus.dedupClustersFromPairs(replicated, pairs, "id", "q")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val plain = clusters(TextDedup.minHashLshPairs(replicated, "text", "id"))
    val collapsed = clusters(
      TextDedup.minHashLshPairsCollapsed(replicated, "text", "id"))
    assert(plain == collapsed)
    assert(plain.nonEmpty)
    // and the star edges really are fewer: 6 copies pair 15 ways plain,
    // 5 ways collapsed
    val nPlain = TextDedup.minHashLshPairs(replicated, "text", "id").count()
    val nCollapsed = TextDedup
      .minHashLshPairsCollapsed(replicated, "text", "id").count()
    assert(nCollapsed < nPlain)
  }

  test("incremental dedup decides short (unsignable) docs keep=true") {
    val sp = spark
    import sp.implicits._
    val index = TextDedup.minHashSignatures(
      Seq((1L, "some existing corpus document text")).toDF("id", "text"),
      "text", "id")
    // 'hello' has ONE token < n=2 shingle width: no signature possible —
    // the doc must still appear in decisions (keep) rather than vanish
    val delta = Seq((7L, "hello"), (8L, "two token doc here"))
      .toDF("id", "text")
    val (dec, admit) = TextDedup.incrementalMinHashDedup(
      delta, index, "text", "id")
    val d = dec.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(d.keySet == Set(7L, 8L)) // nothing dropped from the decision set
    assert(d(7L) && d(8L))
    // but only signable docs enter the admitted index
    assert(admit.select("id").collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  test("incrementalSimHashDedup admits across batches via the sig index") {
    val sp = spark
    import sp.implicits._
    val base = "the quick brown fox jumps over the lazy dog"
    val index1 = TextDedup.simHash(
      Seq((1L, base)).toDF("id", "text"), "text", "id")
    val batch = Seq(
      (10L, base),                                        // dup of index
      (11L, "a corpus of training documents for models"), // fresh
      (12L, "a corpus of training documents for models"), // dup of 11
      (13L, ""))                                          // no tokens
      .toDF("id", "text")
    val (dec, admit) = TextDedup.incrementalSimHashDedup(
      batch, index1, "text", "id", maxHamming = 3)
    val d = dec.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(d(10L) == ((true, false, false)))
    assert(d(11L) == ((false, false, true)))
    assert(d(12L) == ((false, true, false)))
    assert(d(13L) == ((false, false, true))) // short doc: kept, unsigned
    assert(admit.select("id").collect().map(_.getLong(0)).toSeq ==
      Seq(11L)) // only the signable survivor enters the index
    // the appended index catches a batch-2 dup of 11 without re-reading
    // any admitted text
    val index2 = index1.unionByName(admit)
    val (dec2, _) = TextDedup.incrementalSimHashDedup(
      Seq((20L, "a corpus of training documents for models"))
        .toDF("id", "text"),
      index2, "text", "id", maxHamming = 3)
    assert(dec2.collect().map(r =>
      (r.getLong(0), r.getBoolean(3))).toSeq == Seq((20L, false)))
  }

  test("simhash pairs bands=1 (full-width chunk) still buckets correctly") {
    val sp = spark
    import sp.implicits._
    // bands=1, maxHamming=0: candidates are EXACT 64-bit signature
    // matches; the (1L << 64) mask wrap used to zero every chunk and
    // collapse the corpus into one bucket
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines"))
      .toDF("id", "text")
    val pairs = TextDedup.simHashPairs(df, "text", "id",
      bands = 1, maxHamming = 0, maxBucketSize = 2)
    // with the mask bug all three ids landed in bucket 0 (> cap 2) and
    // the exact duplicate pair silently vanished
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
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

  test("simhash 64-bit uses the full width (bit 63 reachable, no overflow)") {
    // pow(2.0, 63).cast(long) saturated at Long.MaxValue; shiftleft must
    // produce genuinely negative signatures when bit 63 is set.
    val hashes = TextDedup.simHash(docs, "text", "id", bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes.values.exists(_ < 0L), "some signature should set bit 63")
    assert(hashes.values.forall(_ != Long.MaxValue))
  }

  test("simhash pairs: banded candidates + exact hamming verify") {
    val pairs = TextDedup.simHashPairs(docs, "text", "id",
      bits = 64, bands = 8, maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0) // identical docs, hamming 0
    // unrelated docs (1,4) must not survive the hamming cut
    assert(!pairs.contains((1L, 4L)))
    assert(pairs.keys.forall { case (a, b) => a < b })
  }

  test("simhash pairs COMPLETE vs brute force (pigeonhole property)") {
    // 40 docs over a tiny vocabulary → dense near-dup signature space.
    // With bands > maxHamming and no effective bucket cap, the banded
    // equi-join must find EXACTLY the brute-force pairs within the
    // hamming bound — the pigeonhole guarantee the scaladoc claims.
    val sp = spark
    import sp.implicits._
    val corpus = (0 until 40).map(i =>
      (i.toLong, s"tok${i % 5} tok${(i / 2) % 7} tok${i % 3} " +
        s"tok${(i * 7) % 11}")).toDF("id", "text")
    val sig = TextDedup.simHash(corpus, "text", "id", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      h = java.lang.Long.bitCount(sig(a) ^ sig(b)) if h <= 3
    } yield (a, b, h)).toSet
    val got = TextDedup.simHashPairs(corpus, "text", "id",
        bits = 16, bands = 4, maxHamming = 3, maxBucketSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded join diverged from brute force: " +
      s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty, "fixture should produce near-dup pairs")
  }

  test("ngram jaccard COMPLETE vs brute force (inverted-index property)") {
    // any pair with jaccard > 0 shares ≥1 shingle, so the inverted-index
    // candidate join loses nothing when no shingle is capped — the
    // library must equal a driver-side brute-force over the same corpus
    val sp = spark
    import sp.implicits._
    val rows = (0 until 30).map(i =>
      (i.toLong, s"tok${i % 4} tok${(i / 3) % 5} tok${i % 2} " +
        s"tok${(i * 3) % 7} tok${i % 4}"))
    val corpus = rows.toDF("id", "text")
    def shingleSet(t: String): Set[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).map(_.mkString(" ")).toSet
    }
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= 0.3
    } yield (a, b)).toSet
    val got = TextDedup.ngramJaccardPairs(corpus, "text", "id",
        n = 2, threshold = 0.3, maxDf = 1000000)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty)
  }

  test("ngram jaccard df-cap drops stop-shingles from index and sizes") {
    val sp = spark
    import sp.implicits._
    // "of the" appears in every doc (df=4 > cap 3) and must not pair the
    // otherwise-unrelated docs 3 and 4; docs 1/2 still pair on their own
    // distinctive shingles.
    val d = Seq(
      (1L, "alpha beta gamma of the"),
      (2L, "alpha beta gamma of the"),
      (3L, "delta echo of the"),
      (4L, "zulu yankee of the"))
      .toDF("id", "text")
    val pairs = TextDedup.ngramJaccardPairs(d, "text", "id",
      n = 2, threshold = 0.5, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH bucket cap suppresses degenerate buckets") {
    val sp = spark
    import sp.implicits._
    // 6 identical boilerplate docs would emit C(6,2)=15 pairs per band;
    // with maxBucketSize=5 their buckets are dropped entirely, while the
    // distinct near-dup pair (10,11) still surfaces.
    val d = (1L to 6L).map(i => (i, "same boilerplate text repeated here"))
      .toDF("id", "text")
      .union(Seq(
        (10L, "unique snowflake content one two three"),
        (11L, "unique snowflake content one two four")).toDF("id", "text"))
    val pairs = TextDedup.minHashLshPairs(d, "text", "id",
      n = 2, numHashes = 16, bands = 8, threshold = 0.3, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)))
    assert(!pairs.exists { case (a, b) => a <= 6L && b <= 6L })
  }

  test("incremental dedup admits against the index across batches") {
    val sp = spark
    import sp.implicits._
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines"))
      .toDF("id", "text")
    val index1 = TextDedup.minHashSignatures(batch1, "text", "id")
    // batch2: 10 dups batch1/#1, 11 fresh, 12 dups 11 (within-batch)
    val batch2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "a corpus of training documents for language models"),
      (12L, "a corpus of training documents for language models"))
      .toDF("id", "text")
    val (dec2, admit2) = TextDedup.incrementalMinHashDedup(
      batch2, index1, "text", "id")
    val d2 = dec2.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(d2(10L) == ((true, false, false)))  // dup of index → dropped
    assert(d2(11L) == ((false, false, true)))  // fresh → kept
    assert(d2(12L) == ((false, true, false)))  // dup of earlier delta doc
    // only KEPT docs' signatures append to the index
    assert(admit2.select("id").collect().map(_.getLong(0)).toSeq == Seq(11L))
    // batch3 dups batch2's survivor — caught via the APPENDED index,
    // proving admitted state carries forward without re-reading text
    val index2 = index1.unionByName(admit2)
    val batch3 = Seq(
      (20L, "a corpus of training documents for language models"))
      .toDF("id", "text")
    val (dec3, _) = TextDedup.incrementalMinHashDedup(
      batch3, index2, "text", "id")
    val d3 = dec3.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(d3(20L) == false)
  }
}
