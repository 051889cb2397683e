package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-curation operators (CorpusQueries) over planted
  * fixtures — the oracle checks byte-equality on generated data; these pin
  * the RULES on documents constructed to trip each one.
  */
class CorpusCurationSpec extends AnyFunSuite with SparkTestSession {

  private def build(name: String, docs: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("corpus_spec").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusQueries.entries.find(_.name == name).get.build(spark, dir)
  }

  private def doc(id: Long, text: String, source: String = "src0") = {
    (id, text, "en", source, text.length.toLong)
  }

  private def docsDF(rows: Seq[(Long, String, String, String, Long)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("gopher rule stack trips each rule independently") {
    val rows = docsDF(Seq(
      doc(1, "the quick brown fox jumps over the lazy sleeping dog"), // all ok
      doc(2, "the tiny doc"),                              // word_count fails (3 < 5)
      doc(3, "the dup dup dup dup dup dup dup dup dup dup dup dup"), // diversity fails
      doc(4, "quick brown foxes jump over seven lazy dogs"),   // stopword fails
      doc(5, "the extraordinarily incomprehensible antidisestablishmentarian " +
        "internationalization constitutionalization characteristically")))
      // doc 5: mean word length > 12 -> word_len fails
    val got = build("x_gopher_quality", rows).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1).getAs[Boolean]("passes"))
    assert(!got(2).getAs[Boolean]("word_count_ok") &&
      got(2).getAs[Boolean]("stopword_ok"))
    assert(!got(3).getAs[Boolean]("diversity_ok") &&
      !got(3).getAs[Boolean]("passes"))
    assert(!got(4).getAs[Boolean]("stopword_ok") &&
      got(4).getAs[Boolean]("word_count_ok"))
    assert(!got(5).getAs[Boolean]("word_len_ok"))
  }

  test("empty/whitespace docs stay in the quality ledger with passes=false") {
    val rows = docsDF(Seq(
      doc(1, "the quick brown fox jumps over the lazy dog"),
      doc(2, ""),      // zero tokens — used to vanish from the output
      doc(3, "   ")))  // whitespace-only likewise
    val got = Corpus.qualityFlags(rows, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // nothing dropped
    assert(got(1).getAs[Boolean]("passes"))
    Seq(2L, 3L).foreach { id =>
      assert(got(id).getAs[Long]("n_words") == 0L)
      assert(got(id).isNullAt(got(id).fieldIndex("mean_word_len")))
      assert(!got(id).getAs[Boolean]("word_len_ok"))
      assert(!got(id).getAs[Boolean]("diversity_ok"))
      assert(!got(id).getAs[Boolean]("passes"))
    }
  }

  test("redaction catches uppercase emails (case was a PII leak)") {
    val out = Corpus.redactPii(
      docsDF(Seq(doc(1, "Contact John.Doe@Example.COM today"))),
      "text", "doc_id").collect().head
    assert(out.getAs[Long]("n_emails") == 1L)
    assert(!out.getAs[String]("redacted").contains("Example.COM"))
  }

  test("contamination measures benchmark shingle overlap") {
    // doc 0 (0 % 97 == 0) IS the benchmark; doc 1 copies it verbatim
    // (contamination 1.0), doc 2 shares nothing, doc 3 shares a prefix
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = docsDF(Seq(
      doc(0, bench),
      doc(1, bench),
      doc(2, "one two three four five six seven eight nine"),
      doc(3, "alpha beta gamma delta unrelated tail words here")))
    val got = build("x_contamination", rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("contamination"), r.getAs[Boolean]("contaminated")))
      .toMap
    assert(got(1) == ((1.0, true)))
    assert(!got.contains(2)) // zero overlap -> not emitted
    // doc 3: 6 distinct 3-gram shingles, 2 in the benchmark vocabulary
    assert(got(3)._1 == 0.3333 && !got(3)._2)
    assert(!got.contains(0)) // benchmark docs are excluded from the check
  }

  test("incremental contamination: persisted vocab + suite registration") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val suiteB = "one two three four five six seven eight nine"
    val docs = docsDF(Seq(
      doc(10, bench),   // suite A
      doc(11, suiteB),  // suite B, registered between batches
      doc(1, bench),                                       // dup of A
      doc(2, suiteB),                                      // dup of B
      doc(3, "totally fresh words nothing shared at all today")))
    val suiteA = docs.filter(col("doc_id") === 10)
    val sB = docs.filter(col("doc_id") === 11)
    val indexA = Corpus.benchmarkVocab(suiteA, "text", "doc_id")
    // batch 1 = docs 1 and 2 against A only: 2's overlap with B is
    // invisible (B not yet registered)
    val out1 = Corpus.incrementalContamination(
      docs.filter(col("doc_id").isin(1, 2)), indexA, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out1 == Map(1L -> 1.0))
    // suite B registers: the extension carries ONLY B's new shingles
    val ext = Corpus.extendBenchmarkVocab(indexA, sB, "text", "doc_id")
    assert(ext.count() == 7 &&
      ext.join(indexA, Seq("shingle"), "left_semi").count() == 0)
    // batch 2 = docs 2 and 3 against A∪B: 2 now flags, 3 still clean
    val out2 = Corpus.incrementalContamination(
      docs.filter(col("doc_id").isin(2, 3)), indexA.unionAll(ext),
      "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out2 == Map(2L -> 1.0))
  }

  test("softDedupWeights preserves one document-equivalent per cluster") {
    val rows = docsDF(Seq(
      doc(1, "the quick brown fox jumps over the lazy dog"),
      doc(2, "the quick brown fox jumps over the lazy dog"),  // dup of 1
      doc(3, "a completely different document about engines")))
    val got = Corpus.softDedupWeights(rows, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // the pair shares mass 0.5 + 0.5; the singleton is implicit weight 1
    assert(got == Map(1L -> ((2L, 0.5)), 2L -> ((2L, 0.5))))
  }

  test("dsirLogWeights ranks target-like docs above divergent ones") {
    val sp = spark
    import sp.implicits._
    val target = Seq((100L, "alpha alpha alpha gamma"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha alpha gamma"),   // target-like
      (2L, "beta beta delta"))     // disjoint vocabulary
      .toDF("doc_id", "text")
    val got = Corpus.dsirLogWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) > got(2L),
      s"target-like doc must outrank the divergent one: $got")
    // every target token is unseen in raw's buckets → positive ratio
    assert(got(1L) > 0 && got(2L) < 0)
  }

  test("temperatureMix keeps the smallest group whole, halves a 4x group") {
    val sp = spark
    import sp.implicits._
    // 4 'big' rows vs 1 'small' row: bounds are 65536·sqrt(1/4)=32768
    // and 65536 — the tail group always survives whole
    val rows = (1L to 4L).map(i => (i, s"doc $i", "big", "s", 5L)) :+
      ((9L, "doc 9", "small", "s", 5L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.temperatureMix(df, "lang", "doc_id")
      .select("doc_id", "lang", "bound").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bounds = out.map(t => t._2 -> t._3).toMap
    assert(bounds.get("small").contains(65536L))
    assert(bounds.get("big").forall(_ == 32768L))
    // the small group's row is present regardless of its hash bucket
    assert(out.exists(_._1 == 9L))
  }

  test("dedup pipeline keeps the richest copy per near-dup cluster") {
    val base = "spark engine dedup pipeline canonical selection test words"
    val rows = docsDF(Seq(
      doc(10, base),
      doc(11, base),                         // exact dup of 10
      doc(12, base + " extra"),              // near-dup, longer (richest)
      doc(20, "completely different content with no overlap at all here")))
    val got = build("x_dedup_pipeline", rows).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("canonical_doc"),
        r.getAs[Long]("cluster_size")))
    // one cluster {10,11,12}; canonical = 12 (max n_chars); singletons
    // (doc 20, no edges) don't appear
    assert(got.toSeq == Seq((10L, 12L, 3L)))
  }

  test("tokenizer splits on any whitespace run, same as the dedup family") {
    val sp = spark
    import sp.implicits._
    // tabs, newlines, and multi-space runs must all tokenize identically
    // to TextDedup.shingles' \s+ tokenizer (and to the regexp-based
    // oracles) — a single-space split would emit empty/glued tokens here
    val df = Seq((1L, "alpha\tbeta\n\ngamma  delta epsilon")).toDF("id", "text")
    val toks = df.select(Corpus.tokens(col("text")).as("toks"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("alpha", "beta", "gamma", "delta", "epsilon"))
    val sh = TextDedup.shingles(df, "text", "id", 2)
      .collect().map(_.getString(1)).toSet
    assert(sh == Set("alpha beta", "beta gamma", "gamma delta",
      "delta epsilon"))
  }

  test("dedupClusters rejects non-integral id columns up front") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", "some text here", 10L), ("b", "some text here", 12L))
      .toDF("doc_id", "text", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Corpus.dedupClusters(df, "text", "doc_id", "n_chars")
    }
    assert(e.getMessage.contains("integral pair ids"))
  }

  test("topNgramCharFrac spikes on phrase loops that unigram diversity misses") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),     // "a b" ×3 of 5 grams; 6 chars total
      (2L, "x y z"),           // all grams unique → tie → smallest gram
      (3L, "solo"),            // < 2 tokens → no n-gram, row drops
      (4L, "spark is neat and spark is fast")) // "spark is" ×2
      .toDF("doc_id", "text")
    val out = Corpus.topNgramCharFrac(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (("a b", 3L, 1.0)))          // 3 × 2 chars / 6
    assert(out(2L) == (("x y", 1L, 0.6667)))       // tie → lexicographic
    assert(!out.contains(3L))
    assert(out(4L)._1 == "spark is" && out(4L)._2 == 2L)
    // phrase loop: doc 1's unigram diversity is a healthy-looking 2/6
    // but its top 2-gram owns ALL characters — the signal is disjoint
    assert(out(1L)._3 == 1.0)
  }

  test("vocabTopK ranks by count then token, bounded by k") {
    val rows = docsDF(Seq(
      doc(1, "alpha alpha alpha beta beta gamma"),
      doc(2, "alpha beta delta")))
    val got = Corpus.vocabTopK(rows, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("alpha", 4L, 1L), ("beta", 3L, 2L),
      ("delta", 1L, 3L))) // delta < gamma breaks the tie at rank 3
  }

  test("tfidf: corpus-wide tokens score zero, rare tokens dominate") {
    val rows = docsDF(Seq(
      doc(1, "common common rare"),
      doc(2, "common common common"),
      doc(3, "common other other")))
    val got = Corpus.tfIdfScores(rows, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 3 && got(2L)._1 == 3)
    // doc 2 is all corpus-wide tokens: idf = ln(1) = 0 -> score 0
    assert(got(2L)._2 == 0.0)
    // docs 1 and 3 each carry one doc-unique token type; doc 3 has two
    // occurrences of it, so it outranks doc 1, which outranks doc 2
    assert(got(3L)._2 > got(1L)._2 && got(1L)._2 > 0.0)
  }

  test("chunkDupStats flags verbatim boilerplate chunks across docs") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val uniq = (id: Long) => (1 to 10).map(i => s"u${id}_$i").mkString(" ")
    val rows = docsDF(Seq(
      doc(1, s"$boiler ${uniq(1)}"),     // 2 chunks, 1 dup
      doc(2, s"$boiler ${uniq(2)}"),     // 2 chunks, 1 dup
      doc(3, uniq(3)),                   // 1 chunk, 0 dup
      doc(4, "too short")))              // < 10 tokens: not emitted
    val got = Corpus.chunkDupStats(rows, "text", "doc_id",
        chunkTokens = 10, flagAt = 0.5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 1L, 0.5, true)))
    assert(got(2L) == ((2L, 1L, 0.5, true)))
    assert(got(3L) == ((1L, 0L, 0.0, false)))
  }

  test("packSequences bins docs by starting token offset per group") {
    val rows = docsDF(Seq(
      doc(1, "a b c d e f", "s1"),      // toks 6, start 0  -> seq 0
      doc(2, "g h i j", "s1"),          // toks 4, start 6  -> seq 0
      doc(3, "k l m n o", "s1"),        // toks 5, start 10 -> seq 1
      doc(4, "p q", "s2"),              // start 0          -> seq 0
      doc(5, "   ", "s2")))             // empty: dropped
    val got = Corpus.packSequences(rows, "text", "doc_id", "source",
        tokenBudget = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got == Map(
      1L -> ((6L, "s1#0")), 2L -> ((4L, "s1#0")), 3L -> ((5L, "s1#1")),
      4L -> ((2L, "s2#0"))))
  }

  test("packTokenized: greedy no-split fill, overlong surfacing, and " +
      "STRING ids kept verbatim (never cast numeric)") {
    val sp = spark
    import sp.implicits._
    // string ids pin the generic-id contract: the original defect cast
    // idCol to long, nulling these and scrambling the packing order
    val counts = Seq(
      ("doc-a", "s1", 5L),  // k=6, seq 0 @ 0
      ("doc-b", "s1", 3L),  // k=4, 6+4=10 fits ctx 10 -> seq 0 @ 6
      ("doc-c", "s1", 4L),  // k=5, crosses -> starts seq 1 @ 0
      ("doc-d", "s1", 11L), // k=12 > ctx -> overlong, excluded from state
      ("doc-e", "s1", 4L),  // k=5, continues seq 1 @ 5
      ("doc-f", "s2", 1L),  // k=2, own stream, seq 0 @ 0
      ("doc-g", "s2", 0L))  // nTok <= 0: dropped
      .toDF("doc_id", "source", "n_tok")
    val got = Corpus.packTokenized(counts, "doc_id", "source", "n_tok",
        ctxLen = 10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), Option(r.getString(3)), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got == Map(
      "doc-a" -> ((6L, Some("s1#0"), 0L, false)),
      "doc-b" -> ((4L, Some("s1#0"), 6L, false)),
      "doc-c" -> ((5L, Some("s1#1"), 0L, false)),
      "doc-d" -> ((12L, None, -1L, true)),
      "doc-e" -> ((5L, Some("s1#1"), 5L, false)),
      "doc-f" -> ((2L, Some("s2#0"), 0L, false))))
    // the id column keeps its ORIGINAL type
    assert(Corpus.packTokenized(counts, "doc_id", "source", "n_tok", 10)
      .schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("incrementalPackTokenized: batched == one concatenated run; state " +
      "carries absent streams forward; overlong never touches state") {
    val sp = spark
    import sp.implicits._
    // batch-0 ids sort before batch-1 ids within every stream, so ONE
    // packTokenized run over the union is the concatenated-order truth
    val b0 = Seq(
      ("a1", "s1", 5L),  // k=6,  s1 seq 0 @ 0
      ("a2", "s1", 3L),  // k=4,  s1 seq 0 @ 6 -> end 10
      ("b1", "s2", 1L),  // k=2,  s2 seq 0 @ 0 -> end 2
      ("c1", "s3", 2L))  // k=3,  s3 only in batch 0 -> end 3
      .toDF("doc_id", "source", "n_tok")
    val b1 = Seq(
      ("d1", "s1", 4L),  // k=5,  10%10=0 -> seq 1 @ 0 -> end 15
      ("d2", "s1", 11L), // k=12 > 10: overlong, excluded from state
      ("d3", "s1", 4L),  // k=5,  seq 1 @ 5 -> end 20
      ("e1", "s2", 9L),  // k=10, 2+10 crosses -> seq 1 @ 0 -> end 20
      ("f1", "s4", 2L))  // k=3,  stream NEW in batch 1 -> end 3
      .toDF("doc_id", "source", "n_tok")
    val empty = Corpus.emptyPackState(sp)
    val (p0, st1) = Corpus.incrementalPackTokenized(
      b0, empty, "doc_id", "source", "n_tok", ctxLen = 10)
    val (p1, st2) = Corpus.incrementalPackTokenized(
      b1, st1, "doc_id", "source", "n_tok", ctxLen = 10)
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), r.getLong(4), r.getBoolean(5))).toSet
    // byte-identical to the batch form over the concatenation
    assert(rows(p0) ++ rows(p1) ==
      rows(Corpus.packTokenized(b0.unionByName(b1),
        "doc_id", "source", "n_tok", ctxLen = 10)))
    // mid-point state: every batch-0 stream, at its running end
    def state(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state(st1) == Map("s1" -> 10L, "s2" -> 2L, "s3" -> 3L))
    // final state: s3 carried forward untouched, s4 new, and s1's end
    // unmoved by the overlong d2 (20, not 32)
    assert(state(st2) ==
      Map("s1" -> 20L, "s2" -> 20L, "s3" -> 3L, "s4" -> 3L))
    // an empty delta is a no-op: no packed rows, state returned intact
    val (pE, stE) = Corpus.incrementalPackTokenized(
      b1.limit(0), st2, "doc_id", "source", "n_tok", ctxLen = 10)
    assert(pE.count() == 0 && state(stE) == state(st2))
    // a NULL-group stream keeps its state row (nulls sort first, so a
    // null curGroup sentinel would silently drop it — the original
    // defect): both batches must agree on the running end
    val nb = Seq(("n1", null: String, 4L), ("n2", "s9", 2L),
        ("n3", "null", 4L)) // a source literally NAMED "null"
      .toDF("doc_id", "source", "n_tok")
    val (pN, stN) = Corpus.incrementalPackTokenized(
      nb, Corpus.emptyPackState(sp), "doc_id", "source", "n_tok",
      ctxLen = 10)
    val stNm = stN.collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(stNm == Map(Option.empty[String] -> 5L, Option("s9") -> 3L,
      Option("null") -> 5L))
    // the null stream's seq_id is NULL (SQL concat semantics), never
    // the string "null#0" the "null"-named source legitimately owns
    val seqIds = pN.collect()
      .map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(seqIds == Map("n1" -> None, "n2" -> Some("s9#0"),
      "n3" -> Some("null#0")))
  }

  test("packStats reports padding, fill and overlong spill per stream; " +
      "null and overlong-only streams degrade explicitly") {
    val sp = spark
    import sp.implicits._
    val counts = Seq(
      ("a1", "s1", 5L),          // k=6,  s1#0 @ 0
      ("a2", "s1", 3L),          // k=4,  s1#0 @ 6 -> end 10
      ("a3", "s1", 4L),          // k=5,  s1#1 @ 0 -> end 15
      ("a4", "s1", 11L),         // k=12: overlong spill
      ("b1", null: String, 4L),  // null stream: no seq index exists
      ("c1", "s3", 11L))         // overlong-ONLY stream still reports
      .toDF("doc_id", "source", "n_tok")
    val got = Corpus.packStats(
        Corpus.packTokenized(counts, "doc_id", "source", "n_tok", 10),
        "source", ctxLen = 10)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))).toMap
    assert(got(Some("s1")) ==
      ((3L, 1L, 15L, 12L, Some(2L), Some(5L), Some(0.75))))
    assert(got(Some("s3")) ==
      ((0L, 1L, 0L, 12L, Some(0L), Some(0L), None)))
    assert(got(None) == ((1L, 0L, 5L, 0L, None, None, None)))
  }

  test("packStats: a null stream with ONLY overlong docs still reports " +
      "NULL n_seqs/padding/fill — the rule keys on the source, not on " +
      "packed rows' seq_id") {
    val sp = spark
    import sp.implicits._
    // no packed row exists for the null stream here, so the old
    // seq_id-keyed detection saw nothing and reported 0/0 where the
    // oracle's source-keyed CASE says NULL
    val counts = Seq(
      ("o1", null: String, 11L), // overlong on the null stream
      ("c1", "s3", 11L))         // overlong-only NAMED stream: 0s, not NULL
      .toDF("doc_id", "source", "n_tok")
    val got = Corpus.packStats(
        Corpus.packTokenized(counts, "doc_id", "source", "n_tok", 10),
        "source", ctxLen = 10)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))).toMap
    assert(got(None) == ((0L, 1L, 0L, 12L, None, None, None)))
    assert(got(Some("s3")) == ((0L, 1L, 0L, 12L, Some(0L), Some(0L), None)))
  }

  test("readMaterializedSink yields the empty frame (not an NPE) when " +
      "nothing was ever packed — zero-row fill state aggregates a NULL " +
      "snapshot id") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("mat_empty").toString
    try {
      val sink = graft.streaming.DocumentStreaming.materializeSink(
        s"$root/fill", s"$root/tail", s"$root/out",
        "doc_id", "source", "pieces", ctxLen = 10)
      sink(Seq.empty[(String, String, Seq[String])]
        .toDF("doc_id", "source", "pieces"), 0L)
      val got = BpeQueries.readMaterializedSink(sp, root)
      assert(got.count() == 0)
      assert(got.columns.toSeq == Seq("source", "seq_id", "n_docs",
        "n_pad", "tokens", "final_end", "n_tail_docs"))
    } finally CurationSinkQueries.deleteRec(root)
  }

  test("null-safe final-state join keeps a null-source stream's packed " +
      "AND overlong rows (the x_incremental_pack / x_pack_sink shape)") {
    val sp = spark
    import sp.implicits._
    val counts = Seq(
      ("d1", null: String, 4L),  // k=5: packs on the null stream, end 5
      ("d2", null: String, 11L), // k=12: overlong on the null stream
      ("d3", "s1", 4L))          // k=5: packs on s1, end 5
      .toDF("doc_id", "source", "n_tok")
    val (packed, st) = Corpus.incrementalPackTokenized(
      counts, Corpus.emptyPackState(spark), "doc_id", "source", "n_tok", 10)
    // the query glue joins the packed rows to the final state per
    // stream; a plain inner Seq("source") join silently drops the null
    // stream's rows (null-unsafe equality), diverging from the oracle
    assert(packed.join(st, Seq("source")).count() == 1)
    val joined = packed
      .join(st.select(col("source").as("_src"),
        col("next_end").as("final_end")), col("source") <=> col("_src"))
      .collect()
      .map(r => r.getAs[String]("doc_id") ->
        ((Option(r.getAs[String]("source")),
          r.getAs[Boolean]("overlong"), r.getAs[Long]("final_end"))))
      .toMap
    assert(joined == Map(
      "d1" -> ((None, false, 5L)),
      "d2" -> ((None, true, 5L)),
      "d3" -> ((Some("s1"), false, 5L))))
  }

  test("materializeSequences assembles eos-terminated, tail-padded " +
      "training rows; overlong/null-stream rows excluded; an " +
      "encode/assignment mismatch raises") {
    val sp = spark
    import sp.implicits._
    val toks = Seq(
      ("a1", "s1", Seq("t1", "t2", "t3", "t4", "t5")), // k=6, s1#0 @ 0
      ("a2", "s1", Seq("u1", "u2", "u3")),             // k=4, s1#0 @ 6
      ("a3", "s1", Seq("v1", "v2", "v3", "v4")),       // k=5, s1#1 @ 0
      ("a4", "s1", (1 to 11).map(i => s"w$i")),        // overlong: out
      ("b1", null: String, Seq("x1", "x2")),           // null stream: out
      // id "a1" REUSED by another stream: the payload join keys on
      // (id, stream) — the original defect cross-matched payloads
      ("a1", "s2", Seq("z1", "z2")))                   // k=3, s2#0 @ 0
      .toDF("doc_id", "source", "pieces")
    val counts = toks.select(col("doc_id"), col("source"),
      size(col("pieces")).cast("long").as("n_tok"))
    val packed = Corpus.packTokenized(counts, "doc_id", "source",
      "n_tok", ctxLen = 10)
    val got = Corpus.materializeSequences(packed, toks, "doc_id",
        "source", "pieces", ctxLen = 10).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getSeq[String](4).toList))).toMap
    assert(got == Map(
      "s1#0" -> ((2L, 0L, List("t1", "t2", "t3", "t4", "t5", "[EOS]",
        "u1", "u2", "u3", "[EOS]"))),
      "s1#1" -> ((1L, 5L, List("v1", "v2", "v3", "v4", "[EOS]",
        "[PAD]", "[PAD]", "[PAD]", "[PAD]", "[PAD]"))),
      "s2#0" -> ((1L, 7L, List("z1", "z2", "[EOS]", "[PAD]", "[PAD]",
        "[PAD]", "[PAD]", "[PAD]", "[PAD]", "[PAD]")))))
    // a doc whose payload outgrew its assignment must raise, not
    // silently truncate or emit an over-length sequence
    val grown = toks.withColumn("pieces",
      when(col("doc_id") === "a2",
        concat(col("pieces"), array(lit("extra"), lit("extra2"))))
        .otherwise(col("pieces")))
    assertThrows[Exception] {
      Corpus.materializeSequences(packed, grown, "doc_id", "source",
        "pieces", ctxLen = 10).collect()
    }
  }

  test("splitAssign is deterministic, total, and roughly 80/10/10") {
    val rows = docsDF((1L to 1000L).map(i => doc(i, s"doc $i")))
    val got = Corpus.splitAssign(rows, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 1000)
    assert(got("train") > 700 && got("train") < 900)
    assert(got("val") > 40 && got("test") > 40)
    // stability: the same id gets the same split on a different corpus
    val sub = Corpus.splitAssign(rows.filter(col("doc_id") <= 100), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val full = Corpus.splitAssign(rows, "doc_id")
      .filter(col("doc_id") <= 100)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(sub == full)
  }

  test("hash and stratified samples are deterministic and bounded") {
    val rows = docsDF((1L to 200L).map(i =>
      doc(i, s"document number $i body", s"src${i % 3}")))
    val s1 = build("x_hash_sample", rows).collect().map(_.getLong(0)).toSeq
    val s2 = build("x_hash_sample", rows).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.nonEmpty && s1.size < 60)
    val strat = build("x_stratified_sample", rows).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perStratum = strat.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perStratum.keySet == Set("src0", "src1", "src2"))
    assert(perStratum.values.forall(_ == 20))
  }

  test("sourceMix keeps sources by weight, deterministically") {
    val rows = docsDF((1L to 40L).map(i =>
      doc(i, "some text", if (i <= 20) "srcA" else "srcB")))
    val mixed = Corpus.sourceMix(rows, "source", "doc_id",
        Seq("srcA" -> 0.0, "srcB" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(3)))
    // weight 0 eliminates, weight 1 keeps everything (16-bit field < 65536)
    assert(mixed.forall(_._2 == "srcB"))
    assert(mixed.length == 20)
    val again = Corpus.sourceMix(rows, "source", "doc_id",
        Seq("srcA" -> 0.0, "srcB" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(mixed.toSeq == again.toSeq)
  }

  test("selectToBudget fills each group's quota with its best docs") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, words(10), "en", "g1", 50L), // best quality, starts at 0
      (2L, words(8), "en", "g1", 40L),  // starts at 10 < 15 -> kept
      (3L, words(2), "en", "g1", 30L),  // starts at 18 >= 15 -> dropped
      (4L, words(30), "en", "g2", 99L)) // alone over budget: still kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Corpus.selectToBudget(rows, "text", "doc_id",
        "source", "n_chars", 15L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, 10L), (2L, 8L, 18L), (4L, 30L, 30L)))
  }

  test("dedupChunksInDoc strips repeated chunks, keeps first occurrence") {
    val sp = spark
    import sp.implicits._
    val a = "one two three four five six seven eight nine ten" // 10 toks
    val rows = Seq(
      (1L, s"$a $a x y"),      // doubled + tail: chunks c1 c2 c1 c2
      (2L, a),                 // no repeats
      (3L, "just four words"))  // under one chunk: all tail
      .toDF("doc_id", "text")
    val got = Corpus.dedupChunksInDoc(rows, "text", "doc_id", 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 4L, 2L, s"$a x y")))
    assert(got(1) == ((2L, 2L, 2L, a)))
    assert(got(2) == ((3L, 0L, 0L, "just four words")))
  }

  test("stripCorpusBoilerplate removes cross-doc chunks, keeps tails") {
    val sp = spark
    import sp.implicits._
    val header = "terms of service apply to this site" // 7 toks (1 chunk@7)
    val rows = Seq(
      (1L, s"$header alpha beta gamma"),   // header + 3-tok tail
      (2L, s"$header delta epsilon"),      // header + 2-tok tail
      (3L, "unique body seven tokens in a row"), // 1 unique chunk, no tail
      (4L, "short doc"))                   // all tail
      .toDF("doc_id", "text")
    val got = Corpus.stripCorpusBoilerplate(rows, "text", "doc_id",
        chunkTokens = 7, dfThreshold = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // the shared header chunk (df=2) is stripped from BOTH docs; the
    // unique chunk and all tails survive verbatim
    assert(got(0) == ((1L, 1L, 1L, "alpha beta gamma")))
    assert(got(1) == ((2L, 1L, 1L, "delta epsilon")))
    assert(got(2) == ((3L, 1L, 0L, "unique body seven tokens in a row")))
    assert(got(3) == ((4L, 0L, 0L, "short doc")))
  }

  test("lmAvgNll scores reference-like text low and unseen text high, " +
      "with exact add-one bigram arithmetic") {
    val sp = spark
    import sp.implicits._
    // reference "a b a b a": bigrams (a,b)x2, (b,a)x2; c(a)=c(b)=2; V=2
    val ref = Seq((100L, "a b a b a")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "a b a"),  // 2 bigrams, both seen: -ln((2+1)/(2+2)) = 0.287682
      (2L, "x y"),    // 1 bigram, fully unseen: -ln(1/(0+2)) = 0.693147
      (3L, "solo"))   // < 2 tokens: no bigram, excluded
      .toDF("doc_id", "text")
    val got = Corpus.lmAvgNll(raw, ref, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == 2)
    assert(got(0) == ((1L, 2L, 0.2877)))
    assert(got(1) == ((2L, 1L, 0.6931)))
    assert(got(0)._3 < got(1)._3,
      "reference-like text must score below unseen text")
  }

  test("lmAvgNll order=3: exact add-one trigram arithmetic, bounded " +
      "count tables") {
    val sp = spark
    import sp.implicits._
    // reference "a b c a b c": trigrams (a,b,c)x2, (b,c,a), (c,a,b);
    // histories c(a,b)=2, c(b,c)=1, c(c,a)=1; V=3
    val ref = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val raw = Seq(
      // (a,b,c): -ln((2+1)/(2+3)) = 0.510826
      // (b,c,d): unseen under history (b,c): -ln(1/(1+3)) = 1.386294
      (1L, "a b c d"),
      // (c,a,b): -ln((1+1)/(1+3)) = 0.693147
      (2L, "c a b"),
      (3L, "x y"))    // < 3 tokens: no trigram, excluded
      .toDF("doc_id", "text")
    val got = Corpus.lmAvgNll(raw, ref, "text", "doc_id", order = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == 2)
    // (0.510826 + 1.386294) / 2 = 0.948560 → 0.9486
    assert(got(0) == ((1L, 2L, 0.9486)))
    assert(got(1) == ((2L, 1L, 0.6931)))
    // the broadcast stays bounded by the exemplar slice: the trigram
    // and history tables can never exceed the reference token count
    val refToks = 6L
    val tris = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
      .select(explode(expr(
        "transform(sequence(2, size(split(text, ' ')) - 1), i -> " +
          "concat_ws('', split(text, ' ')[i-2], " +
          "split(text, ' ')[i-1], split(text, ' ')[i]))")).as("t"))
      .distinct().count()
    assert(tris <= refToks, "trigram table bounded by exemplar tokens")
  }

  test("substringDupSpans catches unaligned duplicated runs and merges " +
      "overlapping windows into maximal spans") {
    val sp = spark
    import sp.implicits._
    // a 6-token duplicated run, placed at DIFFERENT offsets in the two
    // docs — chunk-aligned dedup would miss it; stride-1 windows must
    // flag every covering window and merge them into one span
    val run = "one two three four five six"
    val rows = Seq(
      (1L, s"$run aa bb cc dd"),            // run at tokens [0, 6)
      (2L, s"xx yy $run zz ww"),            // run at tokens [2, 8)
      (3L, "p q r s t u v w"),              // no duplication
      (4L, "tiny"))                         // shorter than the window
      .toDF("doc_id", "text")
    val got = Corpus.substringDupSpans(rows, "text", "doc_id",
        windowTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .sortBy(_._1)
    // doc 1: 10 toks → 7 windows; the run's 4-token windows at pos
    // 0,1,2 are shared with doc 2 → one merged span [0, 6) = 6 tokens
    assert(got(0) == ((1L, 7L, 3L, 1L, 6L, "0-6")))
    // doc 2: 10 toks → 7 windows; shared windows at pos 2,3,4 → [2, 8)
    assert(got(1) == ((2L, 7L, 3L, 1L, 6L, "2-8")))
    // doc 3: windows exist but none duplicated
    assert(got(2) == ((3L, 5L, 0L, 0L, 0L, "")))
    // doc 4 is below the window size: excluded (no window exists)
    assert(got.length == 3)
  }

  test("substringDupSpans keeps DISJOINT duplicated regions as " +
      "separate spans and merges adjacent ones") {
    val sp = spark
    import sp.implicits._
    val a = "alpha beta gamma delta"       // 4-token run A
    val b = "epsilon zeta eta theta"       // 4-token run B
    val rows = Seq(
      // doc 1 carries A and B separated by a 3-token unique gap →
      // two disjoint spans; doc 2/3 donate the duplicates separately
      (1L, s"$a u1 u2 u3 $b"),
      (2L, s"$a k1 k2 k3 k4 k5"),
      (3L, s"m1 m2 m3 m4 m5 $b"),
      // doc 4 carries A and B back to back: dup windows at pos 0 and
      // pos 4 exactly — spans [0,4) and [4,8) are ADJACENT (p ==
      // prev + L) and must merge into one contiguous region
      (4L, s"$a $b w1 w2"))
      .toDF("doc_id", "text")
    val got = Corpus.substringDupSpans(rows, "text", "doc_id",
        windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getString(5))).sortBy(_._1)
    assert(got(0) == ((1L, "0-4;7-11")))
    assert(got(1)._2 == "0-4")
    assert(got(2)._2 == "5-9")
    assert(got(3) == ((4L, "0-8")))
  }

  test("stripSubstringDups keeps the lowest-(doc,pos) canonical copy, " +
      "strips unaligned copies with tails kept, merges adjacent runs, " +
      "and passes short/clean docs verbatim") {
    val sp = spark
    import sp.implicits._
    val run = "one two three four five six"  // 6-token duplicated run
    val a = "alpha beta gamma delta"         // 4-token run A
    val b = "epsilon zeta eta theta"         // 4-token run B
    val rows = Seq(
      (1L, s"$run aa bb cc dd"),   // canonical copy at [0,6) — intact
      (2L, s"xx yy $run zz ww"),   // unaligned copy at [2,8) — stripped
      (3L, s"pp $run qq"),         // third copy at [1,7) — stripped
      (4L, "p  q r"),              // clean + short: verbatim (dbl space)
      (5L, "tiny"),
      (6L, s"$a u1 u2 u3 $b"),     // canonical for BOTH A and B — intact
      (7L, s"k0 $a k1 k2 $b"),     // copies of A [1,5) and B [7,11)
      (8L, s"$a $b w1 w2"))        // back-to-back: [0,4)+[4,8) merge
      .toDF("doc_id", "text")
    val got = Corpus.stripSubstringDups(rows, "text", "doc_id",
        windowTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(_._1).toList
    assert(got(0) == ((1L, 10L, 0L, 0L, s"$run aa bb cc dd")))
    assert(got(1) == ((2L, 10L, 1L, 6L, "xx yy zz ww")))
    assert(got(2) == ((3L, 8L, 1L, 6L, "pp qq")))
    assert(got(3) == ((4L, 3L, 0L, 0L, "p  q r"))) // whitespace verbatim
    assert(got(4) == ((5L, 1L, 0L, 0L, "tiny")))
    assert(got(5) == ((6L, 11L, 0L, 0L, s"$a u1 u2 u3 $b")))
    assert(got(6) == ((7L, 11L, 2L, 8L, "k0 k1 k2")))
    // adjacent spans coalesce: ONE 8-token span, only tails survive
    assert(got(7) == ((8L, 10L, 1L, 8L, "w1 w2")))
  }

  test("incrementalSubstringStrip admits batches against the digest " +
      "index: index dups strip, fresh intra-batch dups keep lowest, " +
      "appended digests carry to the next batch") {
    val sp = spark
    import sp.implicits._
    val run = "one two three four five six" // admitted 6-token run
    val f = "fa fb fc fd fe"                // fresh 5-token run
    val batch1 = Seq((1L, s"$run aa bb"), (2L, "solo words only here"))
      .toDF("doc_id", "text")
    val index1 = Corpus.substringDigestIndex(batch1, "text", "doc_id",
      windowTokens = 4).localCheckpoint()
    val batch2 = Seq(
      (10L, s"xx $run yy"), // copies an ADMITTED run -> index dups
      (11L, s"$f m1 m2"),   // canonical for the fresh run (lowest doc)
      (12L, s"n1 $f n2"),   // intra-batch copy -> stripped
      (13L, "tiny doc"))    // short: verbatim, zero windows
      .toDF("doc_id", "text")
    val (res2, fresh2) = Corpus.incrementalSubstringStrip(
      batch2, index1, "text", "doc_id", windowTokens = 4)
    val got = res2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8)))
      .sortBy(_._1).toList
    // (id, n_tokens, n_windows, fresh, ixdup, intradup, spans,
    //  stripped, text)
    assert(got(0) == ((10L, 8L, 5L, 2L, 3L, 0L, 1L, 6L, "xx yy")))
    assert(got(1) == ((11L, 7L, 4L, 4L, 0L, 0L, 0L, 0L, s"$f m1 m2")))
    // n_fresh counts NOT-INDEXED windows — intra-batch dups included
    // (n_fresh + n_ixdup = n_windows; intra dups are a subset of fresh)
    assert(got(2) == ((12L, 7L, 4L, 4L, 0L, 2L, 1L, 5L, "n1 n2")))
    assert(got(3) == ((13L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, "tiny doc")))
    // 8 distinct fresh window digests appended (the shared fresh-run
    // windows of docs 11/12 count once)
    assert(fresh2.count() == 8L)
    // next batch strips against index1 UNION the appended digests: the
    // fresh run is now admitted (canonical in doc 11), so a copy in
    // batch 3 is an INDEX dup — admitted text never re-read
    val index2 = index1.unionAll(fresh2)
    val batch3 = Seq((20L, s"zz $f ww")).toDF("doc_id", "text")
    val r3 = Corpus.incrementalSubstringStrip(
        batch3, index2, "text", "doc_id", windowTokens = 4)._1
      .collect().head
    assert(r3.getLong(4) == 2L)        // n_index_dup_windows
    assert(r3.getLong(5) == 0L)        // no intra dups
    assert(r3.getString(8) == "zz ww") // run stripped, tails kept
  }

  test("substring admission index invariant: the accumulated fresh-digest " +
      "union equals the bootstrap index over the whole corpus, for any " +
      "batch split") {
    val sp = spark
    import sp.implicits._
    val run = "one two three four five six"
    val docsAll = Seq(
      (1L, s"$run aa bb"), (2L, "solo words only here"),
      (3L, s"xx $run yy"), (4L, "fa fb fc fd fe"),
      (5L, s"fa fb fc fd fe tail"), (6L, "tiny"))
    // every contiguous 2-way and 3-way split admits to the same index
    val splits: Seq[Seq[Seq[(Long, String)]]] =
      (1 until docsAll.size).map(i => Seq(docsAll.take(i), docsAll.drop(i))) :+
        Seq(docsAll.take(2), docsAll.slice(2, 4), docsAll.drop(4))
    val bootstrap = Corpus.substringDigestIndex(
        docsAll.toDF("doc_id", "text"), "text", "doc_id", windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (batches <- splits) {
      var index = Seq.empty[(Long, Long)].toDF("h1", "h2")
      for (b <- batches) {
        val (_, fresh) = Corpus.incrementalSubstringStrip(
          b.toDF("doc_id", "text"), index, "text", "doc_id",
          windowTokens = 4)
        index = index.unionAll(fresh).localCheckpoint()
      }
      val acc = index.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(acc == bootstrap,
        s"split ${batches.map(_.map(_._1))} diverged: " +
          s"${acc.size} vs ${bootstrap.size}")
    }
  }

  test("incrementalSubstringStrip over an empty index equals the batch " +
      "stripSubstringDups on the same corpus") {
    val sp = spark
    import sp.implicits._
    val run = "one two three four five six"
    val a = "alpha beta gamma delta"
    val b = "epsilon zeta eta theta"
    val rows = Seq(
      (1L, s"$run aa bb cc dd"), (2L, s"xx yy $run zz ww"),
      (3L, s"pp $run qq"), (4L, "p  q r"), (5L, "tiny"),
      (6L, s"$a u1 u2 u3 $b"), (7L, s"k0 $a k1 k2 $b"),
      (8L, s"$a $b w1 w2"))
      .toDF("doc_id", "text")
    val emptyIx = Seq.empty[(Long, Long)].toDF("h1", "h2")
    val shared = Seq("doc_id", "n_tokens", "n_spans", "stripped_tokens",
      "text")
    val inc = Corpus.incrementalSubstringStrip(
        rows, emptyIx, "text", "doc_id", windowTokens = 4)._1
      .select(shared.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)
    val batch = Corpus.stripSubstringDups(rows, "text", "doc_id",
        windowTokens = 4)
      .select(shared.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)
    assert(inc.toSeq == batch.toSeq)
  }

  test("redactPii scrubs emails, IPv4s and phones with counts intact") {
    val rows = docsDF(Seq(
      doc(1, "mail alice.smith@corp.example and bob_2@mail.example now"),
      doc(2, "host 10.1.255.7 backup 192.168.0.1 phone 555-0099"),
      doc(3, "nothing sensitive here at all"),
      doc(4, "edge user@sub.domain.example near 1.2.3.4 call 555-1234")))
    val got = Corpus.redactPii(rows, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 2L, 0L, 0L,
      "mail <EMAIL> and <EMAIL> now")))
    assert(got(1) == ((2L, 0L, 2L, 1L,
      "host <IP> backup <IP> phone <PHONE>")))
    assert(got(2) == ((3L, 0L, 0L, 0L, "nothing sensitive here at all")))
    assert(got(3) == ((4L, 1L, 1L, 1L,
      "edge <EMAIL> near <IP> call <PHONE>")))
  }

  test("bm25Search ranks term-dense short docs first, ignores unknowns") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark spark spark"),            // dense in the query term
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "spark engine"))
      .toDF("doc_id", "text")
    val top = Corpus.bm25Search(docs, "text", "doc_id",
        "spark zzz-not-in-corpus spark", k = 3) // dup + unknown terms
      .collect().map(r => r.getLong(0)).toSeq
    // only docs containing a query term rank; repetition saturates (k1)
    // but length normalization still puts the dense short docs first
    assert(top.toSet.subsetOf(Set(1L, 2L, 4L)) && top.size == 3)
    assert(top.head == 1L || top.head == 4L)
    assert(top.indexOf(2L) == 2, s"long sparse doc must rank last: $top")
  }

  test("bm25SearchIndexed over unioned per-batch deltas equals the " +
      "batch bm25Search, byte-identically") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq(
      (1L, "spark spark spark"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "spark engine"),
      (7L, "spark engine engine late arrival"),  // the arrival batch
      (17L, "filler spark"))
      .toDF("doc_id", "text")
    val batch = Corpus.bm25Search(corpus, "text", "doc_id",
        "spark engine", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // admit in two batches; index = union of deltas; query from index.
    // Old docs' scores must re-weight under the grown corpus (df/N/avgdl
    // recomputed at query time), so the equality is exact, not
    // approximate.
    val arr = corpus.filter(pmod(col("doc_id"), lit(10)) === 7)
    val adm = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val (p0, l0) = Corpus.bm25IndexDelta(adm, "text", "doc_id")
    val (p1, l1) = Corpus.bm25IndexDelta(arr, "text", "doc_id")
    val inc = Corpus.bm25SearchIndexed(p0.unionAll(p1), l0.unionAll(l1),
        "doc_id", "spark engine", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inc == batch)
    assert(inc.nonEmpty && inc.map(_._1).contains(7L))
  }
}
