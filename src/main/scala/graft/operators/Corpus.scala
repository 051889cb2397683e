package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Library API for corpus curation — the parameterized forms behind
  * CorpusQueries: composite quality rules, deterministic sampling,
  * benchmark-contamination measurement, and the end-to-end near-dup
  * removal pipeline. Everything here composes with [[TextDedup]] /
  * [[Similarity]] and stays shuffle-minimal:
  *
  *  - quality rules and hash sampling are map-only (scan-bound at 100 TB);
  *  - contamination broadcasts the benchmark VOCABULARY (eval suites are
  *    bounded), so membership tests never shuffle the corpus;
  *  - dedup clustering rides the capped pair generators and the
  *    distributed connected-components loop.
  */
object Corpus {

  /** Whitespace tokens (any `\s+` run, matching [[TextDedup.shingles]]'s
    * tokenizer exactly — pinned by CorpusLibSpec's whitespace-variant
    * fixtures), empties dropped. */
  def tokens(textCol: Column): Column =
    filter(split(trim(textCol), "\\s+"), t => t =!= "")

  /** Gopher-style composite quality rule stack. Returns the input plus
    * per-rule boolean flags and the combined `passes` — per-rule flags
    * survive so downstream can attribute rejections (quality-filter
    * ablations need the breakdown, not just the verdict). */
  def qualityFlags(df: DataFrame, textCol: String,
      minWords: Int = 5, maxWords: Int = 10000,
      minMeanWordLen: Double = 2, maxMeanWordLen: Double = 12,
      minDistinctRatio: Double = 0.3,
      stopwords: Seq[String] =
        Seq("the", "a", "of", "el", "le", "der")): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    // zero-token docs stay IN the ledger (null stats, every flag false,
    // passes=false): the contract is "input plus attributable flags",
    // and silently dropping the empty/whitespace junk class made the
    // per-rule rejection counts stop reconciling with the input
    val meanLen = when(nWords > 0, aggregate(toks, lit(0L),
      (acc, t) => acc + length(t)).cast("double") / nWords)
    val distinctRatio = when(nWords > 0,
      size(array_distinct(toks)).cast("double") / nWords)
    val stopHits = size(filter(toks,
      x => stopwords.map(w => x === w).reduce(_ || _)))
    val wordCountOk = nWords.between(minWords, maxWords)
    val wordLenOk =
      coalesce(meanLen.between(minMeanWordLen, maxMeanWordLen), lit(false))
    val diversityOk = coalesce(distinctRatio >= minDistinctRatio, lit(false))
    val stopwordOk = stopHits > 0
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len", round(meanLen, 4).cast("double"))
      .withColumn("distinct_ratio", round(distinctRatio, 4).cast("double"))
      .withColumn("word_count_ok", wordCountOk)
      .withColumn("word_len_ok", wordLenOk)
      .withColumn("diversity_ok", diversityOk)
      .withColumn("stopword_ok", stopwordOk)
      .withColumn("passes",
        wordCountOk && wordLenOk && diversityOk && stopwordOk)
  }

  /** Deterministic hash sample: rows whose md5(id) hex prefix sorts under
    * `bound` ("1a" ≈ 10.2%). Reproducible across engines, runs, and
    * cluster sizes (rand()-based sample() is none of those), and
    * map-only — the filter runs inside the scan stage. */
  def hashSample(df: DataFrame, idCol: String,
      bound: String = "1a"): DataFrame =
    df.filter(substring(md5(col(idCol).cast("string")), 1,
      bound.length) < bound)

  /** Deterministic stratified sample: `k` rows per stratum in md5 order.
    * One shuffle on the stratum key; fine while strata are numerous and
    * bounded — for a handful of corpus-scale strata combine with
    * [[hashSample]] as a pre-filter (the sc3_topk_per_key two-phase
    * shape) so no single stratum serializes through one task. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** Benchmark contamination: per corpus doc, the count and fraction of
    * its distinct word n-gram shingles appearing anywhere in the
    * benchmark docs' vocabulary. Docs with zero overlap are not emitted.
    *
    * Scale shape: the corpus is shingled ONCE; the bounded benchmark
    * vocabulary broadcasts and tags each corpus shingle in a map-side
    * left-outer join (vocab is distinct, so no row fan-out), and a single
    * per-doc aggregation counts totals and hits together. The corpus
    * never shuffles for the membership test, and — unlike a
    * semi-join-then-rejoin formulation — is never tokenized or
    * aggregated twice. Returns (idCol, n_hit, contamination,
    * contaminated). */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      flagAt: Double = 0.8): DataFrame =
    incrementalContamination(corpus,
      benchmarkVocab(benchmark, textCol, idCol, n),
      textCol, idCol, n, flagAt)

  /** The benchmark's distinct shingle vocabulary — the PERSISTED index
    * of the incremental form. Bounded by the eval suites' size (millions
    * of shingles, not corpus-scale), so it broadcasts. */
  def benchmarkVocab(benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame =
    TextDedup.shingles(benchmark, textCol, idCol, n)
      .select("shingle").distinct()

  /** New benchmark docs → ONLY the shingles absent from the index —
    * append them and the index stays distinct without a rewrite (the
    * substring-admission append-only discipline). */
  def extendBenchmarkVocab(index: DataFrame, newBenchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame =
    benchmarkVocab(newBenchmark, textCol, idCol, n)
      .join(index, Seq("shingle"), "left_anti")

  /** Incremental contamination screening: an ARRIVAL batch (or the
    * whole corpus, for the batch form above) is shingled once and
    * tested against a prebuilt benchmark-vocabulary index — the
    * benchmark is never re-read, mirroring the x_incremental_dedup /
    * incrementalSubstringStrip admission pattern. When new eval suites
    * register between batches, extendBenchmarkVocab appends exactly the
    * missing shingles and later batches see the grown index; screening
    * results for ALREADY-screened batches are immutable (append-only
    * index ⇒ monotone, batch-order-free for a fixed index state).
    *
    * Scale shape: one map-side shingle pass over the arrivals, one
    * broadcast left join against the bounded vocab, one per-doc
    * aggregation; no state but the vocab index is touched, and the
    * index update itself is a left-anti join narrowed to the NEW
    * suite's shingles. */
  def incrementalContamination(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      flagAt: Double = 0.8): DataFrame = {
    val sh = TextDedup.shingles(delta, textCol, idCol, n)
    val vocab = index.select("shingle").withColumn("_hit", lit(1))
    val agg = sh.join(broadcast(vocab), Seq("shingle"), "left_outer")
      .groupBy("id")
      .agg(count(lit(1)).as("n_sh"), count(col("_hit")).as("n_hit"))
      .filter(col("n_hit") > 0)
    val rate = col("n_hit").cast("double") / col("n_sh")
    agg.select(col("id").as(idCol), col("n_hit"),
      round(rate, 4).cast("double").as("contamination"),
      (rate >= flagAt).as("contaminated"))
  }

  /** Corpus-frequency top-k tokens (vocabulary heavy hitters). Spark
    * plans the orderBy+limit as TakeOrderedAndProject — per-partition
    * top-k then a k-sized merge on the driver — so no global sort ever
    * materializes; the groupBy partial-aggregates map-side. Returns
    * (token, cnt, rank) with a deterministic (cnt desc, token) order. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
    // rank over ≤ k rows: the single-partition window is bounded by k
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Gopher-style repetition signal: the character fraction claimed by
    * each document's most frequent word n-gram (boilerplate/loop
    * detector — distinct from unigram diversity, which misses repeated
    * PHRASES built from common words). Character mass is `occurrences ×
    * token chars of the n-gram` over the doc's total token chars,
    * matching qualityFlags' char accounting. Ties break on the
    * lexicographically smallest n-gram so results are engine-stable.
    *
    * Scale shape: MAP-ONLY. A document's top n-gram is a function of that
    * document alone, so counting runs inside one compiled pass per row
    * ([[graft.expr.TopNgramExpr]] — per-row hash map, winner out) and the
    * query never shuffles. The previous explode → groupBy(doc, gram) →
    * per-doc top-1 formulation serialized the corpus's entire n-gram
    * volume through two hash-aggregate exchanges to compute a per-ROW
    * statistic; at 100 TB that shuffle was the whole cost. Ties and
    * char accounting are pinned byte-identical to that formulation
    * (binary-smallest gram, character counts).
    * Returns (idCol, top_gram, top_cnt, top_char_frac); docs with
    * fewer than n tokens drop (no n-gram exists). */
  def topNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 2, "n-gram repetition needs n >= 2 (use distinct_ratio for unigrams)")
    df.select(col(idCol),
        call_function("top_ngram_native", tokens(col(textCol)), lit(n))
          .as("_top"))
      .filter(col("_top").isNotNull)
      .select(col(idCol), col("_top.gram").as("top_gram"),
        col("_top.cnt").as("top_cnt"),
        round((col("_top.cnt") * (length(col("_top.gram")) - lit(n - 1)))
          .cast("double") / col("_top.total_chars"), 4).as("top_char_frac"))
  }

  /** Per-document mean TF-IDF over the corpus's own document frequencies —
    * the lexical-quality score curation stacks rank docs by.
    *
    * Determinism across engines: idf is quantized to DECIMAL(18,6) BEFORE
    * the per-doc sum, and the sum runs in DECIMAL (term counts are exact
    * integers), so no float accumulation order can flip a rounded result;
    * the single double division per doc at the end is IEEE-exact. The doc
    * count N reaches the plan as a broadcast 1-row join, not a driver
    * collect. Returns (idCol, n_toks, tfidf). */
  def tfIdfScores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val perDoc = toks.groupBy("id", "token").agg(count(lit(1)).as("tc"))
    val docLen = perDoc.groupBy("id").agg(sum("tc").as("n_toks"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docLen.agg(count(lit(1)).as("n_docs"))
    val idf = docFreq.crossJoin(broadcast(nDocs))
      .withColumn("idf", round(log(col("n_docs").cast("double") /
        col("df")), 6).cast("decimal(18,6)"))
      .select("token", "idf")
    perDoc.join(idf, Seq("token"))
      .groupBy("id")
      .agg(sum(col("tc") * col("idf")).as("_s"))
      .join(docLen, Seq("id"))
      .select(col("id").as(idCol), col("n_toks"),
        round(col("_s").cast("double") / col("n_toks"), 4).as("tfidf"))
  }

  /** 128-bit chunk digest drawn from TWO hash families: one codegen'd
    * xxhash64 pass (64 bits) plus two codegen'd Murmur3-x86-32 words
    * (plain and prefix-salted, 32+32 bits), packed in a struct key —
    * 16 bytes on the wire instead of a 10-token string (~60–80 bytes
    * typical, unbounded).
    *
    * Collision budget at 100 TB: N distinct chunks collide in expected
    * ~N²/2^129 pairs; at N = 2^41 (≈2.2e12 chunks — 100 TB of 10-token
    * chunks) that is 2^-47 ≈ 7e-15 expected colliding pairs, i.e. zero.
    * A SINGLE xxhash64 would expect 2^82/2^65 ≈ 1.3e5 colliding pairs
    * at that N — why 64 bits alone is not enough. The budget MODELS the
    * three words as independent uniform outputs; neither xxHash64 nor
    * Murmur3 is cryptographic, so the model can be beaten by
    * adversarial inputs — but an input class that correlates the two
    * words of one construction does not transfer across the two
    * DIFFERENT constructions used here (an earlier revision reseeded
    * xxhash64 for the second 64 bits, where a single structural
    * weakness would hit both passes at once). Injectivity is still
    * hash-gated end-to-end at test scale: the string-keyed twins share
    * the digest paths' oracle SQL. A residual collision makes two
    * distinct chunks share a df count (over-stripping/over-flagging by
    * one chunk); it cannot corrupt rebuilt text, which is always
    * rendered from the document's own tokens. */
  private def chunkDigest(chunk: Column): Column =
    struct(xxhash64(chunk).as("h1"),
      hash(chunk).as("h2"),
      hash(lit("graft.chunk.h3"), chunk).as("h3"))

  /** Exact chunk-level duplication stats: split each doc into consecutive
    * `chunkTokens`-token chunks and measure how much of it recurs
    * verbatim elsewhere in the corpus — the substring-level complement of
    * document-level dedup (boilerplate, repeated headers/footers).
    * Returns (idCol, n_chunks, n_dup_chunks, dup_ratio, flagged) per doc
    * with ≥ 1 full chunk; a chunk is "dup" when it appears in ≥ 2 docs.
    *
    * `digestKeyed = true` (the library default) replaces the chunk
    * string with [[chunkDigest]] BEFORE anything shuffles: the distinct,
    * the df aggregation, and the join-back all carry a 16-byte struct
    * instead of raw chunk text, so the op's entire shuffle volume is
    * O(16B · chunks) regardless of chunk width (ChunkShuffleProbe at
    * 10×: 16.1 → 8.6 MB shuffled, 3.9 → 1.9 s, identical checksums;
    * collision budget on [[chunkDigest]]'s scaladoc). `digestKeyed = false` is the byte-exact oracle gate
    * (x_chunk_dedup); both forms return identical rows whenever the
    * digest is injective on the corpus — which the shared oracle SQL
    * checks end-to-end, since DuckDB recomputes on the raw strings. */
  def chunkDupStats(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 10, flagAt: Double = 0.5,
      digestKeyed: Boolean = true): DataFrame = {
    val ct = chunkTokens
    val chStr = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= ct)
      .select(col("id"), explode(expr(
        s"""array_distinct(transform(
           |  sequence(0, CAST(floor(size(toks) / $ct) AS INT) - 1),
           |  i -> concat_ws(' ', slice(toks, i * $ct + 1, $ct))))"""
          .stripMargin)).as("chunk"))
    val ch =
      if (digestKeyed) chStr.select(col("id"), chunkDigest(col("chunk")).as("_k"))
      else chStr.select(col("id"), col("chunk").as("_k"))
    val dfreq = ch.groupBy("_k")
      .agg(countDistinct("id").as("_df"))
    val rate = col("n_dup_chunks").cast("double") / col("n_chunks")
    ch.join(dfreq, Seq("_k"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("id").as(idCol), col("n_chunks"), col("n_dup_chunks"),
        round(rate, 4).as("dup_ratio"), (rate >= flagAt).as("flagged"))
  }

  /** Contiguous sequence packing: assign each doc to a fixed
    * `tokenBudget` training sequence by its starting token offset within
    * its `groupCol` stream (docs in id order, seq = floor(start/budget)) —
    * the packing step that turns a curated corpus into fixed-length
    * training rows. Integer arithmetic only, so the assignment is exact
    * and engine-portable. One shuffle: the per-group running sum; groups
    * (sources/shards) are numerous and bounded, so no single window
    * serializes the corpus — for a monolithic corpus, shard first by
    * hash-bucketing the id into groupCol. Returns
    * (idCol, groupCol, n_toks, seq_id). */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, tokenBudget: Int = 2048): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol),
        size(tokens(col(textCol))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("_cum", sum("n_toks").over(w))
      .withColumn("seq_id",
        concat(col(groupCol), lit("#"),
          floor((col("_cum") - col("n_toks")) / tokenBudget)))
      .drop("_cum")
  }

  /** Tokenizer-aware sequence packing — the last-mile op before
    * training, composing the BPE encode with [[packSequences]]'s
    * budget idea under the GREEDY NO-SPLIT rule: each doc costs its
    * encoded token count plus `eosTokens` (the end-of-document marker a
    * packed corpus inserts between docs); docs fill fixed-`ctxLen`
    * training sequences greedily in `idCol` order within each
    * `groupCol` stream, and a doc whose tokens would cross the
    * sequence boundary STARTS THE NEXT SEQUENCE instead of splitting —
    * the boundary tokens the split-allowed [[packSequences]] form
    * shares across sequences become padding here, which is what
    * document-boundary-respecting training recipes pay. Docs with
    * `nTokCol` <= 0 drop (nothing to pack); docs whose cost exceeds
    * `ctxLen` outright can fit NO sequence and are emitted with
    * `overlong = true`, `seq_id = NULL`, `seq_off = -1`, EXCLUDED from
    * the greedy state (route them to a chunking op — x_pack_sequences'
    * split-allowed form — rather than silently truncating).
    *
    * Scale shape: greedy packing is inherently sequential PER STREAM
    * (each doc's placement depends on all earlier placements), so this
    * is the one operator family that runs as genuine per-partition
    * imperative logic: one shuffle co-locates each group, a
    * sort-within-partitions orders it, and a single O(1)-state linear
    * scan assigns sequences — no collect, no window over the corpus.
    * Parallelism is across groups; one monster group serializes through
    * one task by construction (the greedy order IS the semantics) —
    * shard such streams upstream into (source, shard) groups when that
    * matters.
    *
    * Returns (idCol, groupCol, n_tokens = encoded + eos, seq_id =
    * "group#n", seq_off = start offset inside the sequence, overlong).
    */
  def packTokenized(counts: DataFrame, idCol: String, groupCol: String,
      nTokCol: String, ctxLen: Int, eosTokens: Int = 1): DataFrame = {
    require(ctxLen > eosTokens, "ctxLen must exceed the EOS cost")
    val spark = counts.sparkSession
    // idCol keeps its ORIGINAL type (string ids are as valid an
    // admission order as numeric ones — forcing a long cast would
    // silently null non-numeric ids); it must be orderable and unique,
    // since the per-stream (groupCol, idCol) sort IS the packing order
    val proj = counts
      .filter(col(nTokCol) > 0)
      .select(col(idCol), col(groupCol).cast("string").as(groupCol),
        (col(nTokCol).cast("long") + eosTokens).as("_k"))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
    val ctx = ctxLen.toLong
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      proj.schema.head, // idCol, original type
      StructField(groupCol, StringType),
      StructField("n_tokens", LongType),
      StructField("seq_id", StringType, nullable = true),
      StructField("seq_off", LongType),
      StructField("overlong", BooleanType)))
    val packed = proj.rdd.mapPartitions { it =>
      // per-partition state machine: (current group, its running end)
      var curGroup: String = null
      var curEnd: Long = 0L
      it.map { r =>
        val (id, g, k) = (r.get(0), r.getString(1), r.getLong(2))
        if (g != curGroup) { curGroup = g; curEnd = 0L }
        if (k > ctx) Row(id, g, k, null, -1L, true)
        else {
          val (start, end) = greedyAdvance(curEnd, k, ctx)
          curEnd = end
          Row(id, g, k, seqId(g, start, ctx), start % ctx, false)
        }
      }
    }
    spark.createDataFrame(packed, outSchema)
  }

  /** THE greedy no-split step both packing scans (batch and
    * incremental) share, the Scala twin of the SQL foldCtes CASE: a
    * doc of cost k either continues the current fill or starts the
    * next ctx-boundary sequence. Returns (start, newEnd). A fill-rule
    * fix lands here once or the two scans diverge. */
  private def greedyAdvance(curEnd: Long, k: Long, ctx: Long)
      : (Long, Long) = {
    val start =
      if (curEnd % ctx + k > ctx) (curEnd / ctx + 1) * ctx else curEnd
    (start, start + k)
  }

  /** Null stream ⇒ null seq_id (SQL concat semantics — the DuckDB
    * twin's source || '#' || n is NULL; interpolating would also
    * collide with a source literally named "null"). Null-group docs
    * still pack and keep state; give streams real names upstream if
    * their sequences must be addressable. */
  private def seqId(g: String, start: Long, ctx: Long): String =
    if (g == null) null else s"$g#${start / ctx}"

  /** Packing-efficiency report over [[packTokenized]] (or the
    * incremental/sink forms') output — the numbers a practitioner
    * reads to size ctxLen and decide whether the overlong spill
    * warrants a split-allowed path: per stream, packed doc/sequence
    * counts, token mass, padding cost (the no-split rule's boundary
    * padding PLUS the final sequence's tail — together
    * n_seqs·ctx − n_tokens, since greedy sequences are contiguous
    * 0..max), fill ratio, and the overlong doc/token spill. One
    * bounded groupBy over the packed assignments; the corpus is never
    * re-read. A NULL stream's rows carry no seq index (NULL seq_id, the
    * SQL concat rule), so its n_seqs/padding/fill report NULL — name
    * streams upstream if their fill cost must be accountable.
    *
    * Input contract: `packed` must be a stream's COMPLETE accumulated
    * assignments (the batch form's output, or the UNION of every
    * incremental/sink batch partition). A single batch's slice reports
    * silently-wrong padding/fill: n_seqs derives from the global max
    * sequence index while the token mass would cover only the slice. */
  def packStats(packed: DataFrame, groupCol: String,
      ctxLen: Int): DataFrame = {
    val ctx = lit(ctxLen.toLong)
    val idx = substring_index(col("seq_id"), "#", -1).cast("long")
    val packedRow = !col("overlong")
    val nSeqs = coalesce(col("_max_idx") + 1L, lit(0L))
    packed
      .groupBy(col(groupCol))
      .agg(
        sum(when(packedRow, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("overlong"), 1L).otherwise(0L)).as("n_overlong"),
        sum(when(packedRow, col("n_tokens")).otherwise(0L))
          .as("n_tokens"),
        sum(when(col("overlong"), col("n_tokens")).otherwise(0L))
          .as("overlong_tokens"),
        max(when(packedRow, idx)).as("_max_idx"))
      // the null-stream rule keys on the SOURCE itself (the groupBy
      // key), not on packed rows' null seq_id: a null stream whose docs
      // are all overlong has no packed row at all, and deriving
      // nullness from the rows would report n_seqs=0/padding=0 where
      // the rule (and the DuckDB twin's source-keyed CASE) says NULL
      .select(col(groupCol), col("n_docs"), col("n_overlong"),
        col("n_tokens"), col("overlong_tokens"),
        when(col(groupCol).isNotNull, nSeqs).as("n_seqs"),
        when(col(groupCol).isNotNull, nSeqs * ctx - col("n_tokens"))
          .as("padding_tokens"),
        when(col(groupCol).isNotNull && col("_max_idx").isNotNull,
          round(col("n_tokens").cast("double") /
            ((col("_max_idx") + 1L) * ctx), 6)).as("fill_ratio"))
  }

  /** Materialize [[packTokenized]] assignments into actual training
    * rows: each packed doc's encoded token array (`tokCol`) lands at
    * its assignment — docs in `seq_off` order, `eos` appended after
    * every doc, `pad` filling the tail to exactly ctxLen. Greedy
    * sequences fill contiguously from offset 0, so padding is ONLY
    * ever the tail (what [[packStats]] prices). One payload shuffle —
    * the per-sequence groupBy — and that shuffle IS the output;
    * overlong docs and null-stream rows (no addressable sequence)
    * are excluded, surface them via [[packStats]]. The caller supplies
    * the SAME encode the assignments were computed from
    * (size(tokCol) + eos == n_tokens); a mismatch that overflows a
    * sequence raises rather than silently truncating.
    * Returns (groupCol, seq_id, n_docs, n_pad, tokens[ctxLen]). */
  def materializeSequences(packed: DataFrame, tokens: DataFrame,
      idCol: String, groupCol: String, tokCol: String, ctxLen: Int,
      eos: String = "[EOS]", pad: String = "[PAD]"): DataFrame =
    assembleSequences(
      packed
        .filter(!col("overlong") && col("seq_id").isNotNull)
        // payload key is (id, stream) — ids unique only per stream
        // must not cross-match payloads between streams
        .join(tokens.select(col(idCol),
          col(groupCol).cast("string").as(groupCol),
          col(tokCol).as("_toks")), Seq(idCol, groupCol))
        .select(col(groupCol), col("seq_id"), col("seq_off"),
          col("_toks")),
      groupCol, ctxLen, eos, pad)

  /** The assembly core shared by [[materializeSequences]] and the
    * incremental form: rows = (groupCol, seq_id, seq_off, _toks). */
  private def assembleSequences(rows: DataFrame, groupCol: String,
      ctxLen: Int, eos: String, pad: String): DataFrame = {
    val ctx = lit(ctxLen.toLong)
    rows
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        flatten(transform(
          array_sort(collect_list(struct(col("seq_off").as("o"),
            col("_toks").as("t")))),
          p => concat(p("t"), array(lit(eos))))).as("_body"))
      .select(col(groupCol), col("seq_id"), col("n_docs"),
        (ctx - size(col("_body"))).as("n_pad"),
        when(size(col("_body")) > ctx, raise_error(concat(
          lit("sequence assembly: encode/assignment mismatch " +
            "overflows "), col("seq_id"))))
          .otherwise(concat(col("_body"),
            array_repeat(lit(pad), (ctx - size(col("_body")))
              .cast("int")))).as("tokens"))
  }

  /** The bootstrap state for [[incrementalPackTokenized]]: zero
    * streams. Single-sources the (groupCol, next_end) state schema the
    * operator consumes and returns. */
  def emptyPackState(spark: SparkSession,
      groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(groupCol, StringType),
        StructField("next_end", LongType))))
  }

  /** Incremental [[packTokenized]] — the admission-family form of the
    * packer: an ARRIVAL batch of encoded docs packs against the
    * persisted per-stream fill state instead of re-scanning the packed
    * corpus. State is ONE row per stream — (groupCol, next_end), the
    * stream's running token offset — so the corpus-side cost of
    * packing an unbounded intake is O(streams), not O(docs); packed
    * sequences are never re-read or re-numbered (append-only, the
    * admission-sink discipline). Greedy fill state is exactly that
    * offset, so packing batches incrementally in arrival order is
    * BYTE-IDENTICAL to one batch run over the concatenated order —
    * the property the oracle row gates. Callers deliver batches in
    * admission order (ids order within a batch, batches in sequence),
    * like every incremental form here.
    *
    * Scale shape: the bounded state co-partitions WITH the delta (a
    * tagged union sorted so each stream's state row leads its docs) —
    * no broadcast, no driver map; then the same one-shuffle,
    * O(1)-state per-partition scan as the batch form.
    *
    * Returns (packed, newState): packed = the batch form's row per
    * delta doc; newState = (groupCol, next_end) for EVERY stream seen
    * (carried-forward rows included) — overwrite the state with it and
    * the next batch continues. */
  def incrementalPackTokenized(delta: DataFrame, state: DataFrame,
      idCol: String, groupCol: String, nTokCol: String, ctxLen: Int,
      eosTokens: Int = 1): (DataFrame, DataFrame) = {
    require(ctxLen > eosTokens, "ctxLen must exceed the EOS cost")
    val spark = delta.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val idType = delta.schema(idCol).dataType
    // tagged union: state rows (tag 0) sort before doc rows (tag 1)
    // within their stream, so the per-partition scan initializes each
    // stream's running end before its first doc arrives
    val docRows = delta.filter(col(nTokCol) > 0)
      .select(col(groupCol).cast("string").as(groupCol),
        lit(1).as("_tag"), col(idCol).cast(idType).as(idCol),
        (col(nTokCol).cast("long") + eosTokens).as("_k"))
    val stateRows = state
      .select(col(groupCol).cast("string").as(groupCol),
        lit(0).as("_tag"), lit(null).cast(idType).as(idCol),
        col("next_end").cast("long").as("_k"))
    val combined = stateRows.unionByName(docRows)
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col("_tag"), col(idCol))
    val ctx = ctxLen.toLong
    val outSchema = StructType(Seq(
      StructField("_kind", IntegerType), // 0 = state, 1 = packed doc
      StructField(idCol, idType),
      StructField(groupCol, StringType),
      StructField("n_tokens", LongType),
      StructField("seq_id", StringType, nullable = true),
      StructField("seq_off", LongType),
      StructField("overlong", BooleanType),
      StructField("next_end", LongType)))
    val scanned = spark.createDataFrame(
      combined.rdd.mapPartitions { it =>
        // flush a state row whenever the stream changes (and at the
        // end): every stream seen — docs or carried state — emits its
        // final next_end exactly once. `started` is the explicit
        // no-group-yet flag: a null curGroup sentinel would collide
        // with a legitimate null groupCol value (nulls sort FIRST in
        // their partition, so the null stream is always the first
        // group seen) and silently drop that stream's state row
        var started = false
        var curGroup: String = null
        var curEnd: Long = 0L
        var pendingFlush = false
        new Iterator[Row] {
          private var queued: Row = null
          private def stateRow(g: String, e: Long): Row =
            Row(0, null, g, 0L, null, 0L, false, e)
          def hasNext: Boolean =
            queued != null || it.hasNext || pendingFlush
          def next(): Row = {
            if (queued != null) { val r = queued; queued = null; return r }
            if (!it.hasNext) { // terminal flush
              pendingFlush = false
              return stateRow(curGroup, curEnd)
            }
            val r = it.next()
            val (g, tag, k) = (r.getString(0), r.getInt(1), r.getLong(3))
            var out: Row = null
            if (!started || g != curGroup) {
              if (pendingFlush) out = stateRow(curGroup, curEnd)
              started = true; curGroup = g; curEnd = 0L; pendingFlush = true
            }
            val produced: Row =
              if (tag == 0) { curEnd = k; null } // state init, no row
              else if (k > ctx) Row(1, r.get(2), g, k, null, -1L, true, 0L)
              else {
                val (start, end) = greedyAdvance(curEnd, k, ctx)
                curEnd = end
                Row(1, r.get(2), g, k, seqId(g, start, ctx),
                  start % ctx, false, 0L)
              }
            if (out != null) { queued = produced; out }
            else if (produced != null) produced
            else next()
          }
        }.filter(_ != null)
      }, outSchema).localCheckpoint()
    val packed = scanned.filter(col("_kind") === 1)
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("seq_id"), col("seq_off"), col("overlong"))
    val newState = scanned.filter(col("_kind") === 0)
      .select(col(groupCol), col("next_end"))
    (packed, newState)
  }

  /** The bootstrap tail state for [[incrementalMaterialize]]: zero
    * carried docs. Single-sources the (groupCol, seq_id, seq_off,
    * _toks) payload-tail schema. */
  def emptyMaterializeTail(spark: SparkSession,
      groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(groupCol, StringType),
        StructField("seq_id", StringType),
        StructField("seq_off", LongType),
        StructField("_toks", ArrayType(StringType)))))
  }

  /** Incremental [[materializeSequences]] — the streaming form of the
    * last-mile materialization: an arrival batch of ENCODED docs
    * advances each stream's greedy fill (via
    * [[incrementalPackTokenized]]) and emits every sequence the fill
    * has moved PAST as a finalized eos/pad-complete training row; the
    * docs of each stream's still-filling sequence are carried in
    * `tailState` (payloads included) until a later batch completes it.
    * A sequence is FINAL iff its index < floor(next_end / ctxLen) —
    * the fill can never return to it: the crossing doc that strands a
    * partial sequence also moves the fill past it, and the stranded
    * gap becomes the emitted row's tail padding. Emitted rows are
    * byte-identical to the batch form over the concatenated arrival
    * order restricted to the same final set (the
    * x_materialize_incremental gate).
    *
    * State is bounded: fillState = one (groupCol, next_end) row per
    * stream; tailState = the current partial sequence's docs only —
    * strictly under ctxLen tokens per stream, so O(streams · ctxLen)
    * total regardless of corpus size. Emitted sequences are never
    * re-read or re-written. Overlong and null-stream docs never
    * materialize (surface them via [[packStats]]); callers keep the
    * invariant that tailState's streams appear in fillState (any state
    * pair this function returned satisfies it).
    *
    * Returns (complete, newFillState, newTailState). */
  def incrementalMaterialize(deltaToks: DataFrame, fillState: DataFrame,
      tailState: DataFrame, idCol: String, groupCol: String,
      tokCol: String, ctxLen: Int, eos: String = "[EOS]",
      pad: String = "[PAD]"): (DataFrame, DataFrame, DataFrame) = {
    val counts = deltaToks.select(col(idCol), col(groupCol),
      size(col(tokCol)).cast("long").as("_n"))
    // packed/newFill share the operator's one checkpointed scan
    val (packed, newFill) = incrementalPackTokenized(counts, fillState,
      idCol, groupCol, "_n", ctxLen)
    val batchRows = packed
      .filter(!col("overlong") && col("seq_id").isNotNull)
      // payload key is (id, stream), like materializeSequences
      .join(deltaToks.select(col(idCol),
        col(groupCol).cast("string").as(groupCol),
        col(tokCol).as("_toks")), Seq(idCol, groupCol))
      .select(col(groupCol), col("seq_id"), col("seq_off"),
        col("_toks"))
    val bound = newFill.select(col(groupCol),
      floor(col("next_end") / ctxLen).cast("long").as("_bound"))
    // LEFT join + raise, not inner: a tailState stream missing from
    // fillState (a caller-corrupted state pair — the documented
    // invariant) must fail loudly, not silently discard the carried
    // docs' training payloads.
    // checkpoint: the finalized/tail split below consumes this twice
    val tagged = tailState.unionByName(batchRows)
      .join(bound, Seq(groupCol), "left")
      .withColumn("_bound", when(col("_bound").isNull, raise_error(
        concat(lit("incrementalMaterialize: tailState stream missing " +
          "from fillState: "), col(groupCol))))
        .otherwise(col("_bound")))
      .withColumn("_idx",
        substring_index(col("seq_id"), "#", -1).cast("long"))
      .localCheckpoint()
    (assembleSequences(
        tagged.filter(col("_idx") < col("_bound"))
          .select(col(groupCol), col("seq_id"), col("seq_off"),
            col("_toks")),
        groupCol, ctxLen, eos, pad),
      newFill,
      tagged.filter(col("_idx") >= col("_bound"))
        .select(col(groupCol), col("seq_id"), col("seq_off"),
          col("_toks")))
  }

  /** Deterministic train/val/test split: a 16-bit md5 prefix of the id
    * buckets each row into `train` (< trainUpTo/65536), `val`
    * (< valUpTo/65536), else `test`. Reproducible across engines, runs,
    * and cluster sizes, stable under corpus growth (a doc's split never
    * changes when other docs arrive), and map-only. */
  def splitAssign(df: DataFrame, idCol: String,
      trainUpTo: Int = 52429 /* ≈ 0.8·65536 */,
      valUpTo: Int = 58982 /* ≈ 0.9·65536 */): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.withColumn("split",
      when(h < trainUpTo, "train").when(h < valUpTo, "val")
        .otherwise("test"))
  }

  /** In-document repeated-chunk removal — the C4-style boilerplate strip
    * WITHIN a document (the cross-document complement is
    * [[chunkDupStats]]): split into consecutive `chunkTokens`-token
    * chunks, keep only each chunk's FIRST occurrence (order-stable), and
    * rebuild the text with the un-chunked tail tokens appended. Map-only
    * — pure array ops per row, no shuffle, scan-speed at 100 TB. The
    * first-occurrence filter is an explicit position test
    * (array_position(c) == i + 1) rather than array_distinct, whose
    * ordering other engines don't guarantee — keeping the op
    * oracle-checkable. Returns (idCol, n_chunks, n_kept, cleaned). */
  def dedupChunksInDoc(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 5): DataFrame = {
    val ct = chunkTokens
    df.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .withColumn("_full",
        floor(size(col("_toks")) / ct).cast("int"))
      // slice(seq, 1, _full) instead of sequence(0, _full - 1): Spark's
      // sequence(0, -1) is the DESCENDING [0, -1], so a short doc
      // (_full = 0) needs the slice to produce the empty chunk list.
      .withColumn("_chunks", expr(
        s"""transform(slice(sequence(0, greatest(_full - 1, 0)), 1, _full),
           |  i -> concat_ws(' ', slice(_toks, i * $ct + 1, $ct)))"""
          .stripMargin))
      .withColumn("_kept", expr(
        "filter(_chunks, (c, i) -> array_position(_chunks, c) == i + 1)"))
      .withColumn("_tail", expr(
        s"concat_ws(' ', slice(_toks, _full * $ct + 1, " +
          s"size(_toks) - _full * $ct))"))
      .select(col(idCol),
        size(col("_chunks")).cast("long").as("n_chunks"),
        size(col("_kept")).cast("long").as("n_kept"),
        trim(concat(array_join(col("_kept"), " "), lit(" "), col("_tail")))
          .as("cleaned"))
  }

  /** CROSS-document boilerplate strip — the corpus-level complement of
    * [[dedupChunksInDoc]] ([[chunkDupStats]] only FLAGS): chunk every
    * document into consecutive `chunkTokens`-token chunks, count each
    * chunk's document frequency corpus-wide, and rebuild every text
    * with chunks appearing in >= `dfThreshold` documents removed (the
    * repeated headers/footers/licence blocks a crawl shares), keeping
    * the un-chunked tail tokens. Returns (idCol, n_chunks, n_stripped,
    * text_clean) for every input document.
    *
    * Shape at 100 TB (`digestKeyed = true`, the library default): the
    * chunk STRINGS never shuffle at all. Chunks digest to the 16-byte
    * [[chunkDigest]] map-side; the df table aggregates on the digest
    * (the op's one wide shuffle, O(16B · chunks)); the boilerplate set
    * (`_df >= dfThreshold` digests — headers/footers/licence blocks, a
    * tiny fraction of distinct chunks) semi-join-filters the positional
    * digest rows, leaving only the STRIPPED positions to regroup per
    * document (a near-empty shuffle: most documents strip nothing); and
    * the text is rebuilt MAP-SIDE from the document's own tokens by
    * skipping the dropped positions. So the full text crosses the wire
    * once (the doc-keyed join with the small drop-position table),
    * versus the exact form's chunk-string df shuffle + join-back +
    * kept-chunk regroup. ChunkShuffleProbe at 10×: 15.4 → 9.0 MB
    * shuffled, 2.9 → 1.9 s, identical full-width checksums (the
    * synthetic corpus's 31-word vocab deflates the byte ratio; real
    * crawl text widens it — strings grow with the data, digests stay
    * 16 B). `digestKeyed = false` keeps the byte-exact string-keyed
    * shape as the oracle gate (x_strip_boilerplate); the shared oracle
    * SQL re-derives everything from raw strings in DuckDB, so the
    * digest twin's correctness (digest injectivity included) is checked
    * end-to-end by x_strip_boilerplate_digest. */
  def stripCorpusBoilerplate(df: DataFrame, textCol: String,
      idCol: String, chunkTokens: Int = 10,
      dfThreshold: Int = 2, digestKeyed: Boolean = true): DataFrame = {
    val ct = chunkTokens
    val base = df.select(col(idCol).as("_id"),
        tokens(col(textCol)).as("_toks"))
      .withColumn("_full", floor(size(col("_toks")) / ct).cast("int"))
      .withColumn("_tail", expr(
        s"concat_ws(' ', slice(_toks, _full * $ct + 1, " +
          s"greatest(size(_toks) - _full * $ct, 0)))"))
    // positional chunks: position rides along so the rebuild is
    // order-stable after the regroup (collect_list order is not)
    val chunkRows = base
      .select(col("_id"), explode(expr(
        s"""transform(slice(sequence(0, greatest(_full - 1, 0)), 1, _full),
           |  i -> named_struct('pos', i,
           |    'chunk', concat_ws(' ', slice(_toks, i * $ct + 1, $ct))))"""
          .stripMargin)).as("_c"))
      .select(col("_id"), col("_c.pos").as("_pos"),
        col("_c.chunk").as("_chunk"))
    if (digestKeyed) {
      val chunkD = chunkRows.select(col("_id"), col("_pos"),
        chunkDigest(col("_chunk")).as("_dig"))
      val dfreq = chunkD.groupBy("_dig")
        .agg(countDistinct("_id").as("_df"))
      val hot = dfreq.filter(col("_df") >= dfThreshold).select("_dig")
      val dropPos = chunkD.join(hot, Seq("_dig"), "left_semi")
        .groupBy("_id")
        .agg(sort_array(collect_list(col("_pos"))).as("_drop"))
      base.join(dropPos, Seq("_id"), "left")
        .select(col("_id").as(idCol),
          col("_full").cast("long").as("n_chunks"),
          coalesce(size(col("_drop")).cast("long"), lit(0L))
            .as("n_stripped"),
          array_join(expr(
            s"""filter(array(
               |  concat_ws(' ', transform(
               |    filter(slice(sequence(0, greatest(_full - 1, 0)), 1, _full),
               |      i -> _drop IS NULL OR NOT array_contains(_drop, i)),
               |    i -> concat_ws(' ', slice(_toks, i * $ct + 1, $ct)))),
               |  _tail), x -> x != '')""".stripMargin),
            " ").as("text_clean"))
    } else {
      val dfreq = chunkRows.groupBy("_chunk")
        .agg(countDistinct("_id").as("_df"))
      val agg = chunkRows.join(dfreq, Seq("_chunk"))
        .groupBy("_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("_df") >= dfThreshold, 1L).otherwise(0L))
            .as("n_stripped"),
          array_join(expr("transform(array_sort(collect_list(" +
            s"CASE WHEN _df < $dfThreshold THEN " +
            "named_struct('pos', _pos, 'chunk', _chunk) END)), x -> x.chunk)"),
            " ").as("_kept"))
      base.join(agg, Seq("_id"), "left")
        .select(col("_id").as(idCol),
          coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
          coalesce(col("n_stripped"), lit(0L)).as("n_stripped"),
          array_join(expr(
            "filter(array(_kept, _tail), x -> x IS NOT NULL AND x != '')"),
            " ").as("text_clean"))
    }
  }

  /** CCNet-style language-model quality scoring (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data" — the KenLM perplexity-filtering step, re-expressed
    * as a deterministic bigram LM): train add-one-smoothed bigram
    * probabilities on a REFERENCE corpus (the high-quality exemplar
    * set: a wiki slice, an eval suite), then score every raw document
    * by its average negative log-likelihood — low avg_nll ≈ fluent,
    * high ≈ gibberish/boilerplate, the CCNet head/middle/tail cut.
    *
    *   nll(w1 w2) = -ln((c(w1 w2) + 1) / (c(w1) + V))
    *
    * with c(·) the reference counts and V the reference vocabulary
    * size; unseen words/bigrams degrade gracefully through the same
    * formula (c = 0). Determinism discipline (the tfidf/dsir pattern):
    * each bigram's nll rounds to 6dp, per-doc summation runs in
    * DECIMAL so no float accumulation order can flip a rounded score,
    * and the final average rounds to 4dp.
    *
    * Scale shape: the reference corpus is BOUNDED (an exemplar set),
    * so both count tables and the 1-row vocab size broadcast; the raw
    * corpus explodes to bigrams map-side, probes the broadcasts, and
    * the per-doc aggregation combines map-side — scan-bound at 100 TB
    * with zero corpus-keyed shuffles beyond the per-doc combine.
    * Returns (idCol, n_bigrams — n_ngrams for order > 2, avg_nll) for
    * docs with >= 1 n-gram. */
  def lmAvgNll(raw: DataFrame, reference: DataFrame, textCol: String,
      idCol: String, order: Int = 2): DataFrame = {
    // order 2 is the committed bigram form; order 3 doubles fidelity
    // toward CCNet's 5-gram KenLM for one more broadcast table (the
    // n-gram count tables stay bounded by the exemplar token count)
    require(order >= 2 && order <= 4, s"unsupported LM order $order")
    val ws = (1 to order).map(j => s"w$j")
    val structFields = ws.zipWithIndex.map { case (w, j) =>
      s"'$w', _toks[i - ${order - 1 - j}]"
    }.mkString(", ")
    def ngrams(df: DataFrame, keep: Column*): DataFrame = df
      .select(keep :+ tokens(col(textCol)).as("_toks"): _*)
      .filter(size(col("_toks")) >= order)
      .select(keep :+ explode(expr(
        s"transform(sequence(${order - 1}, size(_toks) - 1), " +
          s"i -> named_struct($structFields))")).as("_b"): _*)
      .select(keep ++ ws.map(w => col(s"_b.$w")): _*)
    // FanOut the raw corpus side before its per-ngram expansion + the
    // broadcast-join scoring chain: with a single-row-group scan the
    // whole tokenize→explode→join→partial-agg pipeline otherwise runs
    // in ONE task (no-op at scale). Reference side is exemplar-sized.
    val rawFo = graft.core.FanOut(raw.select(col(idCol), col(textCol)))
    val refN = ngrams(reference)
    val nCounts = refN.groupBy(ws.head, ws.tail: _*)
      .agg(count(lit(1)).as("cb"))
    // c(history) = the (order-1)-gram HISTORY count (n-grams starting
    // with it), the standard n-gram-MLE denominator; V = the reference
    // vocabulary over every position
    val hist = ws.init
    val uniCounts = refN.groupBy(hist.head, hist.tail: _*)
      .agg(count(lit(1)).as("cu"))
    val vocab = ws.map(w => refN.select(col(w).as("w1")))
      .reduce(_ unionAll _)
      .agg(countDistinct(col("w1")).as("v"))
    val nName = if (order == 2) "n_bigrams" else "n_ngrams"
    ngrams(rawFo, col(idCol))
      .join(broadcast(nCounts), ws, "left")
      .join(broadcast(uniCounts), hist, "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_nll",
        round(-log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cu"), lit(0L)) + col("v"))), 6)
          .cast("decimal(18,6)"))
      .groupBy(idCol)
      .agg(count(lit(1)).as(nName), sum(col("_nll")).as("_s"))
      .select(col(idCol), col(nName),
        round(col("_s").cast("double") / col(nName), 4)
          .as("avg_nll"))
  }

  /** Cross-document SUBSTRING dedup spans (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * exact-substring dedup, re-expressed Spark-first): flag, per
    * document, the maximal token spans covered by `windowTokens`-token
    * windows that appear verbatim in >= 2 distinct documents. Unlike
    * [[chunkDupStats]]'s DISJOINT chunks (alignment-sensitive: a
    * duplicated passage straddling a chunk boundary is missed), the
    * windows here slide at STRIDE 1, so any duplicated run of at least
    * `windowTokens` tokens is caught regardless of alignment — the
    * suffix-array guarantee at the chosen granularity, without a
    * distributed suffix array.
    *
    * Shape at 100 TB: window digests (16 bytes) compute map-side in
    * ONE O(tokens) pass — [[graft.expr.RollingWindowDigestsExpr]], a
    * native two-ring polynomial rolling hash over per-token xxhash64
    * values, so no window STRING is ever even BUILT (the first cut
    * concat_ws'd each window: O(tokens × L) characters, measured 77 s
    * of the operator's 100× noop cost); the df table aggregates on
    * digests (the one wide shuffle, O(16B · tokens)); duplicated
    * digests semi-join-filter the positional rows (most windows are
    * unique, so the per-doc regroup carries only the DUPLICATED
    * positions); and the interval merge is a per-row fold over that
    * small sorted array. Collision budget: a colliding window flags
    * one span as duplicated spuriously — ~2^-44 expected pairs at 2^41
    * windows (the expression's scaladoc states the two-ring model),
    * and the oracle's string-derived recompute gates injectivity
    * end-to-end.
    *
    * Returns (idCol, n_windows, n_dup_windows, n_spans, dup_tokens,
    * spans) where spans is the merged "start-end" token-interval list
    * (end exclusive) and dup_tokens its total covered tokens. */
  /** Interval merge over a sorted `_dups` position array: windows share
    * a length, so the running span end is always (last merged pos) + L;
    * merge when p <= last.e (adjacent runs coalesce). */
  private def mergeSpansFold(L: Int): String =
    s"""aggregate(coalesce(_dups, array()),
       |  CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>),
       |  (acc, p) -> CASE
       |    WHEN size(acc) > 0 AND p <= element_at(acc, -1).e
       |    THEN concat(slice(acc, 1, size(acc) - 1),
       |      array(named_struct('s', element_at(acc, -1).s,
       |        'e', p + $L)))
       |    ELSE concat(acc, array(named_struct('s', p, 'e', p + $L)))
       |    END)""".stripMargin

  def substringDupSpans(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 20): DataFrame = {
    val L = windowTokens
    val base = df.select(col(idCol).as("_id"),
        tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") >= L)
    val winRows = base
      .select(col("_id"), explode(call_function(
        "rolling_window_digests_native", col("_toks"), lit(L))).as("_c"))
      .select(col("_id"), col("_c.pos").as("_pos"),
        struct(col("_c.h1"), col("_c.h2")).as("_dig"))
    val dfreq = winRows.groupBy("_dig")
      .agg(countDistinct("_id").as("_df"))
    val hot = dfreq.filter(col("_df") >= 2).select("_dig")
    val dupPos = winRows.join(hot, Seq("_dig"), "left_semi")
      .groupBy("_id")
      .agg(sort_array(collect_list(col("_pos"))).as("_dups"))
    base.join(dupPos, Seq("_id"), "left")
      .withColumn("_spans", expr(mergeSpansFold(L)))
      .select(col("_id").as(idCol),
        (col("_n") - L + 1).cast("long").as("n_windows"),
        coalesce(size(col("_dups")), lit(0)).cast("long")
          .as("n_dup_windows"),
        size(col("_spans")).cast("long").as("n_spans"),
        expr("aggregate(_spans, 0L, (a, x) -> a + x.e - x.s)")
          .as("dup_tokens"),
        array_join(expr(
          "transform(_spans, x -> concat(x.s, '-', x.e))"), ";")
          .as("spans"))
  }

  /** Cross-document exact-substring STRIP — the consuming step of
    * [[substringDupSpans]] (Lee et al. 2022: of every duplicated
    * substring cluster exactly ONE occurrence survives the corpus):
    * stride-1 L-token window digests; a digest seen in >= 2 distinct
    * documents keeps its lowest-(doc, pos) occurrence as the canonical
    * copy and every OTHER occurrence marks its L-token interval for
    * removal; per doc the marked intervals merge (same fold as the
    * spans operator — adjacent and unaligned runs coalesce) and the
    * text rebuilds from the surviving tokens, boundary tails kept.
    * The substring analog of [[stripCorpusBoilerplate]]'s rebuild.
    *
    * Scale shape: identical to substringDupSpans up to the hot set —
    * the canonical pick rides the SAME digest aggregation (a min-struct
    * beside the distinct-doc count, both map-side combining; no second
    * shuffle), the hot set joins back on the 16-byte digest, and the
    * rebuild is a map-only array filter. Documents shorter than L
    * tokens, and docs whose duplicated windows are all canonical, pass
    * through VERBATIM (original whitespace intact); only stripped docs
    * rebuild with single-space joins — the tokenizer's normalization.
    *
    * Returns (idCol, n_tokens, n_spans, stripped_tokens, text). */
  def stripSubstringDups(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 20): DataFrame = {
    val L = windowTokens
    val base = df.select(col(idCol).as("_id"), col(textCol).as("_text"),
        tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
    val winRows = base.filter(col("_n") >= L)
      .select(col("_id"), explode(call_function(
        "rolling_window_digests_native", col("_toks"), lit(L))).as("_c"))
      .select(col("_id"), col("_c.pos").as("_pos"),
        struct(col("_c.h1"), col("_c.h2")).as("_dig"))
    val hot = winRows.groupBy("_dig")
      .agg(countDistinct("_id").as("_df"),
        min(struct(col("_id"), col("_pos"))).as("_keep"))
      .filter(col("_df") >= 2)
      .select("_dig", "_keep")
    val dupPos = winRows.join(hot, Seq("_dig"))
      .filter(col("_id") =!= col("_keep._id") ||
        col("_pos") =!= col("_keep._pos"))
      .groupBy("_id")
      .agg(sort_array(collect_list(col("_pos"))).as("_dups"))
    base.join(dupPos, Seq("_id"), "left")
      .withColumn("_spans", expr(mergeSpansFold(L)))
      .select(col("_id").as(idCol),
        col("_n").cast("long").as("n_tokens"),
        size(col("_spans")).cast("long").as("n_spans"),
        expr("aggregate(_spans, 0L, (a, x) -> a + x.e - x.s)")
          .as("stripped_tokens"),
        when(size(col("_spans")) === 0, col("_text"))
          .otherwise(expr(
            "concat_ws(' ', filter(_toks, (t, i) -> " +
              "!exists(_spans, sp -> i >= sp.s AND i < sp.e)))"))
          .as("text"))
  }

  /** Bootstrap (or rebuild) the persisted substring-digest index over an
    * admitted corpus: the DISTINCT stride-1 L-token window digests, 16
    * bytes per row — the only corpus-side state
    * [[incrementalSubstringStrip]] ever touches. Equal to the union of
    * every prior batch's appended fresh digests, so a rebuilt index and
    * an accumulated one decide identically. */
  def substringDigestIndex(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 20): DataFrame =
    df.select(tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= windowTokens)
      .select(explode(call_function("rolling_window_digests_native",
        col("_toks"), lit(windowTokens))).as("_c"))
      .select(col("_c.h1").as("h1"), col("_c.h2").as("h2"))
      .distinct()

  /** Incremental cross-document exact-substring STRIP — admit an arrival
    * batch against the persisted digest index of everything already
    * admitted, WITHOUT re-reading admitted text (the
    * [[graft.operators.TextDedup.incrementalMinHashDedup]] admission
    * pattern applied to the Lee et al. substring family; the batch form
    * [[stripSubstringDups]] remains the global compaction path).
    *
    * Decision rules, preserving the batch form's keep-lowest-(doc, pos)
    * contract across the admitted/arrival boundary (ids are the
    * admission order, so every admitted occurrence precedes every
    * arrival occurrence):
    *  - an arrival window whose digest IS in the index strips — its
    *    canonical copy was admitted earlier;
    *  - a FRESH digest (not indexed) seen in >= 2 distinct arrival docs
    *    keeps its lowest-(doc, pos) occurrence and strips the rest —
    *    exactly the batch rule scoped to the batch;
    *  - a fresh digest in a single arrival doc is not duplication at
    *    this grain (the batch form's countDistinct >= 2), nothing
    *    strips.
    * Append the returned fresh-digest set to the index and the next
    * batch continues from there. Note the index records digests whose
    * canonical occurrence was admitted; an overlapping strip span from
    * a DIFFERENT digest may later truncate that occurrence's text —
    * the same already-merged-spans property the batch form (and the
    * suffix-array original) has — so the index upper-bounds the corpus
    * and later batches can only strip more, never less (the dedup-safe
    * direction).
    *
    * Scale shape: one O(tokens) native rolling-digest pass over the
    * batch; classification is ONE left equi-join against the
    * 16-byte/row index (checkpointed — the downstream consumers never
    * re-touch the corpus-scale side or re-tokenize); the intra-batch
    * hot pick is the batch form's single min-struct aggregation; span
    * merge + rebuild are map-only. The corpus-sized side is touched
    * only through the index — O(distinct windows) rows, no text.
    *
    * Returns (result, freshDigests): result = per arrival doc
    * (idCol, n_tokens, n_windows, n_fresh_windows, n_index_dup_windows,
    * n_intra_dup_windows, n_spans, stripped_tokens, text) — the three
    * window counters make the boundary classification itself
    * oracle-gateable; freshDigests = (h1, h2) rows to append. */
  def incrementalSubstringStrip(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String, windowTokens: Int = 20)
      : (DataFrame, DataFrame) = {
    val L = windowTokens
    val base = delta.select(col(idCol).as("_id"), col(textCol).as("_text"),
        tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
    val winRows = base.filter(col("_n") >= L)
      .select(col("_id"), explode(call_function(
        "rolling_window_digests_native", col("_toks"), lit(L))).as("_c"))
      .select(col("_id"), col("_c.pos").as("_pos"),
        col("_c.h1").as("h1"), col("_c.h2").as("h2"))
    // ONE join against the corpus-scale index, checkpointed: the five
    // consumers below (strip positions, hot pick, three counters, the
    // fresh-digest append) would otherwise each re-run an index-sized
    // semi/anti join. A LEFT join is row-preserving because the index
    // is a SET by contract — substringDigestIndex dedups the bootstrap
    // and every append batch is anti-joined fresh, so the accumulated
    // union stays duplicate-free.
    val classed = winRows
      .join(index.select(col("h1"), col("h2"), lit(true).as("_ix")),
        Seq("h1", "h2"), "left")
      .localCheckpoint()
    val dupIx = classed.filter(col("_ix"))
    val freshRows = classed.filter(col("_ix").isNull)
    val hotFresh = freshRows.groupBy("h1", "h2")
      .agg(countDistinct("_id").as("_df"),
        min(struct(col("_id"), col("_pos"))).as("_keep"))
      .filter(col("_df") >= 2)
      .select("h1", "h2", "_keep")
    val dupIntra = freshRows.join(hotFresh, Seq("h1", "h2"))
      .filter(col("_id") =!= col("_keep._id") ||
        col("_pos") =!= col("_keep._pos"))
    val dupPos = dupIx.select("_id", "_pos")
      .unionAll(dupIntra.select("_id", "_pos"))
      .groupBy("_id")
      .agg(sort_array(collect_list(col("_pos"))).as("_dups"))
    val freshCnt = freshRows.groupBy("_id")
      .agg(count(lit(1)).as("_n_fresh"))
    val ixCnt = dupIx.groupBy("_id").agg(count(lit(1)).as("_n_ixdup"))
    val intraCnt = dupIntra.groupBy("_id")
      .agg(count(lit(1)).as("_n_intradup"))
    val result = base
      .join(dupPos, Seq("_id"), "left")
      .join(freshCnt, Seq("_id"), "left")
      .join(ixCnt, Seq("_id"), "left")
      .join(intraCnt, Seq("_id"), "left")
      .withColumn("_spans", expr(mergeSpansFold(L)))
      .select(col("_id").as(idCol),
        col("_n").cast("long").as("n_tokens"),
        greatest(col("_n") - (L - 1), lit(0)).cast("long")
          .as("n_windows"),
        coalesce(col("_n_fresh"), lit(0L)).as("n_fresh_windows"),
        coalesce(col("_n_ixdup"), lit(0L)).as("n_index_dup_windows"),
        coalesce(col("_n_intradup"), lit(0L)).as("n_intra_dup_windows"),
        size(col("_spans")).cast("long").as("n_spans"),
        expr("aggregate(_spans, 0L, (a, x) -> a + x.e - x.s)")
          .as("stripped_tokens"),
        when(size(col("_spans")) === 0, col("_text"))
          .otherwise(expr(
            "concat_ws(' ', filter(_toks, (t, i) -> " +
              "!exists(_spans, sp -> i >= sp.s AND i < sp.e)))"))
          .as("text"))
    val freshDigests = freshRows.select("h1", "h2").distinct()
    (result, freshDigests)
  }

  /** Source-mixture sampling — the training-mixture weighting step:
    * keep each row with its source's probability, decided by a
    * deterministic 16-bit md5 bucket (digest chars 5–8, a DIFFERENT
    * field than [[splitAssign]]'s chars 1–4, so mixture membership and
    * split assignment stay independent). Reproducible across engines,
    * runs and cluster sizes, unlike rand()-based sampling. The weight
    * table is a bounded dimension folded into a literal when-chain —
    * map-only, no join, no shuffle; at 100 TB this is a scan-speed
    * filter that also prunes downstream work proportionally. */
  def sourceMix(df: DataFrame, sourceCol: String, idCol: String,
      weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 5, 4), 16, 10)
      .cast("long")
    val bound = weights.foldLeft(
      lit(math.round(defaultWeight * 65536)): Column) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(math.round(w * 65536))).otherwise(acc)
    }
    df.filter(h < bound)
  }

  /** DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw doc by
    * how much its hashed-token distribution looks like the TARGET
    * corpus — logw(d) = Σ_tokens ln(p_target(bucket)/p_raw(bucket)),
    * with Laplace-smoothed bucket probabilities over `buckets` md5
    * buckets. Selection = take the top logw docs (the deterministic
    * analog of the paper's importance resampling).
    *
    * Determinism discipline (the tfidf/bm25 pattern): each bucket's
    * log-ratio rounds to 6dp and per-doc summation runs in DECIMAL, so
    * no float accumulation order can flip a rounded score. Scale shape:
    * the bucket-weight table is `buckets` rows — broadcast — and both
    * count passes are map-side-combined groupBys; per-doc scoring is a
    * broadcast join + one aggregation. The target corpus is bounded
    * (an eval suite / quality exemplar set), the raw corpus streams.
    * Returns (idCol, n_toks, dsir_logw). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    def tok(df: DataFrame) =
      df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("w"))
        .withColumn("bucket",
          pmod(conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"),
            lit(buckets.toLong)))
    // FanOut the corpus side before the per-token md5 bucketing (tok is
    // consumed twice below — counts and the scoring join — and a
    // single-row-group scan runs both passes on one core; no-op at
    // scale). The bounded target side stays as-is.
    val rawTok = tok(graft.core.FanOut(raw.select(col(idCol), col(textCol))))
    val ct = tok(target).groupBy("bucket").agg(count(lit(1)).as("ct"))
    val cr = rawTok.groupBy("bucket").agg(count(lit(1)).as("cr"))
    // outer-join the two bounded count tables: a bucket seen on only
    // one side still gets its smoothed probability on the other
    val cb = ct.join(cr, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tot = cb.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val wt = cb.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(
          ((col("ct") + lit(1.0)) / (col("nt") + lit(buckets.toDouble))) /
          ((col("cr") + lit(1.0)) / (col("nr") + lit(buckets.toDouble)))),
          6).cast("decimal(18,6)").as("lw"))
    rawTok.join(broadcast(wt), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("lw")).cast("double"), 4).as("dsir_logw"))
      .select(col("id").as(idCol), col("n_toks"), col("dsir_logw"))
  }

  /** Temperature-flattened group mixture (the multilingual-rebalancing
    * step: upweight tail languages/sources by downsampling the head):
    * with α = 0.5, group g keeps rate sqrt(n_min/n_g) — the smallest
    * group survives whole and a group 4× its size is halved, flattening
    * the distribution toward uniform without a normalizing sum (whose
    * float accumulation order would be engine-unstable; n_min/n_g is
    * one exact IEEE division + sqrt, identical everywhere). α is pinned
    * to 0.5 because sqrt is the one power the IEEE spec makes exact —
    * a general pow() answer differs by ulps across libms and could
    * flip a rounded bucket bound. Decision buckets use md5 chars 9–12
    * — a THIRD digest field, independent of both [[splitAssign]]
    * (chars 1–4) and [[sourceMix]] (chars 5–8), so composing source
    * mixing with temperature flattening multiplies the rates instead
    * of the smaller bound silently swallowing the larger.
    * Scale shape: one bounded groupBy for counts, a broadcast rate
    * join, then a map-only filter. Returns the kept rows + the group's
    * 16-bit `bound` (65536 = kept whole). */
  def temperatureMix(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_ng"))
    val minN = counts.agg(min("_ng").as("_nmin"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(groupCol),
        round(sqrt(col("_nmin").cast("double") / col("_ng")) * 65536)
          .cast("long").as("bound"))
    val h = conv(substring(md5(col(idCol).cast("string")), 9, 4), 16, 10)
      .cast("long")
    df.join(broadcast(rates), Seq(groupCol)).filter(h < col("bound"))
  }

  /** Token-budget selection per group — curation-to-budget: take each
    * group's docs in quality-descending order until the group's token
    * budget is exhausted; a doc is kept when its running sum STARTS
    * inside the budget, so the first doc of a group always survives and
    * the budget overshoots by at most one doc (the reference shape for
    * "fill each source's quota with its best documents"). One window
    * partitioned by the group key — groups (sources/shards) are numerous
    * and bounded, so no single partition serializes the corpus; for a
    * monolithic corpus, shard the group key first like
    * [[packSequences]]. Returns (idCol, groupCol, n_toks, cum_toks). */
  def selectToBudget(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, qualityCol: String,
      tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol), col(qualityCol),
        size(tokens(col(textCol))).cast("long").as("n_toks"))
      .withColumn("cum_toks", sum("n_toks").over(w))
      .filter(col("cum_toks") - col("n_toks") < tokenBudget)
      .select(col(idCol), col(groupCol), col("n_toks"), col("cum_toks"))
  }

  /** BM25 document scores (Okapi, k1/b defaults): the retrieval-grade
    * sibling of [[tfIdfScores]] — saturating term frequency and length
    * normalization make it the lexical ranking a curation pipeline
    * actually uses for query-relevance scoring. Same plan shape as
    * TF-IDF: (id, token) counts, token df, a broadcast 1-row stats join
    * (N and avg doc length), one per-doc sum — three narrow shuffles.
    *
    * Determinism: each per-term score is a fixed-order double expression
    * (identical in the oracle SQL), ROUNDED to 6dp and summed in
    * DECIMAL, so partition order cannot flip the rounded per-doc score —
    * the same discipline tfIdfScores applies to its idf. */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = bm25TermScores(df, textCol, idCol, k1, b)
    terms
      .groupBy("id")
      .agg(first("n_toks").as("n_toks"), sum("_ts").as("_s"))
      .select(col("id").as(idCol), col("n_toks"),
        round(col("_s").cast("double"), 4).as("bm25"))
  }

  /** BM25 query search: top-k docs for a query string — the retrieval
    * form. IDF/avgdl statistics come from the FULL corpus (a query must
    * not change term weights); only the final per-doc sum is restricted
    * to the query's distinct terms, so the scoring join touches
    * |query terms| narrow posting lists, not the corpus. Top-k plans as
    * TakeOrderedAndProject (per-partition top-k, k-sized driver merge);
    * ties break on the doc id. */
  def bm25Search(df: DataFrame, textCol: String, idCol: String,
      query: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val qTerms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query must contain at least one token")
    bm25TermScores(df, textCol, idCol, k1, b)
      .filter(col("token").isin(qTerms: _*))
      .groupBy("id")
      .agg(sum("_ts").as("_s"))
      .select(col("id").as(idCol),
        round(col("_s").cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Per-doc mean unigram surprisal — the language-model quality filter
    * (the corpus's own unigram LM standing in for the external LM of
    * CCNet-style perplexity filtering): surprisal(tok) = ln(total /
    * count(tok)) in nats, quantized to DECIMAL(18,6); a doc's score is
    * the token-count-weighted mean. High = improbable token stream
    * (gibberish, wrong language, encoding junk); unusually low = rote
    * repetition of the corpus's most common tokens. Same three narrow
    * shuffles and decimal-sum determinism as [[tfIdfScores]]. */
  def unigramSurprisal(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val perDoc = toks.groupBy("id", "token").agg(count(lit(1)).as("tc"))
    val docLen = perDoc.groupBy("id").agg(sum("tc").as("n_toks"))
    val tokFreq = perDoc.groupBy("token").agg(sum("tc").as("cnt"))
    val total = tokFreq.agg(sum("cnt").as("total"))
    val surprisal = tokFreq.crossJoin(broadcast(total))
      .withColumn("sp", round(
        log(col("total").cast("double") / col("cnt")), 6)
        .cast("decimal(18,6)"))
      .select("token", "sp")
    perDoc.join(surprisal, Seq("token"))
      .groupBy("id")
      .agg(sum(col("tc") * col("sp")).as("_s"))
      .join(docLen, Seq("id"))
      .select(col("id").as(idCol), col("n_toks"),
        round(col("_s").cast("double") / col("n_toks"), 4)
          .as("mean_surprisal"))
  }

  /** A batch's contribution to the incremental BM25 inverted index —
    * the x_incremental_dedup admission pattern applied to lexical
    * retrieval: the index is (postings, docLens) with postings =
    * (id, token, tc) and docLens = (id, n_toks), both PURE per-doc
    * statistics (independent of every other document), so maintenance
    * under append-only admission is a UNION of per-batch deltas — the
    * corpus text is never re-read and the corpus-dependent parts of the
    * score (df, N, avgdl) are recomputed from the narrow index at query
    * time, which is what keeps an incrementally-built index EXACTLY
    * equal to a from-scratch one (BM25 weights of old documents change
    * as the corpus grows; an index that froze scores could not be).
    * Bootstrap = this function over the initial corpus. */
  def bm25IndexDelta(df: DataFrame, textCol: String,
      idCol: String): (DataFrame, DataFrame) = {
    // FanOut before tokenize/explode: a single-row-group scan otherwise
    // runs the whole per-token pass on one core (no-op at scale)
    val toks = graft.core.FanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("token"))
    val perDoc = toks.groupBy("id", "token").agg(count(lit(1)).as("tc"))
    val docLen = perDoc.groupBy("id").agg(sum("tc").as("n_toks"))
    (perDoc, docLen)
  }

  /** BM25 query search over a maintained inverted index
    * ([[bm25IndexDelta]] unions) — the serving path: the query-term
    * filter restricts the postings BEFORE document frequencies are
    * computed (df of a term over its own filtered postings equals its
    * full-vocabulary df, so the result is IDENTICAL to [[bm25Search]]
    * while only |query terms| posting lists flow through the scoring
    * join); corpus stats (N, avgdl) aggregate the narrow docLens side.
    * Same quantized expression as the batch scorer — one shared
    * [[bm25TermScoresFromIndex]] core, so the two paths cannot drift. */
  def bm25SearchIndexed(postings: DataFrame, docLens: DataFrame,
      idCol: String, query: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val qTerms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query must contain at least one token")
    bm25TermScoresFromIndex(
        postings.filter(col("token").isin(qTerms: _*)), docLens, k1, b)
      .groupBy("id")
      .agg(sum("_ts").as("_s"))
      .select(col("id").as(idCol),
        round(col("_s").cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Shared BM25 core: one row per (doc, term) with the quantized
    * per-term score `_ts` (DECIMAL(18,6) — see [[bm25Scores]]'s
    * determinism note) and the doc length. */
  private def bm25TermScores(df: DataFrame, textCol: String, idCol: String,
      k1: Double, b: Double): DataFrame = {
    val (perDoc, docLen) = bm25IndexDelta(df, textCol, idCol)
    bm25TermScoresFromIndex(perDoc, docLen, k1, b)
  }

  /** The scoring core over index state — used by both the batch path
    * (via [[bm25TermScores]]) and the incremental serving path
    * ([[bm25SearchIndexed]]); a single spelling of the score keeps the
    * two provably the same rule. */
  private def bm25TermScoresFromIndex(perDoc: DataFrame, docLen: DataFrame,
      k1: Double, b: Double): DataFrame = {
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      round(avg(col("n_toks").cast("decimal(18,6)")), 6).cast("double")
        .as("avgdl"))
    val idf = docFreq.crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0),
        6))
      .select("token", "idf", "avgdl")
    perDoc.join(docLen, Seq("id")).join(idf, Seq("token"))
      .withColumn("_ts", round(
        col("idf") * (col("tc") * (k1 + 1)) /
          (col("tc") +
            lit(k1) * (lit(1 - b) + lit(b) * col("n_toks") / col("avgdl"))),
        6).cast("decimal(18,6)"))
      .select("id", "token", "n_toks", "_ts")
  }

  /** Training-shard assignment — the last mile of curation: kept docs
    * get a deterministic shard id such that consecutive docs (in id
    * order) fill each shard to ~`tokensPerShard` before the next opens.
    * shard = floor((running_sum − n_toks) / budget): a doc whose tokens
    * straddle a boundary belongs to the shard it STARTED in, so every
    * shard except the last holds ≥ budget − (doc's tokens) and the
    * assignment is a pure function of (ids, texts, budget).
    *
    * Runs on [[Skew.globalRunningSum]] — range-partitioned prefix sums,
    * NOT a global window (single-partition sort). Callers shard WITHIN a
    * split (train/val/test) by filtering first; writing the result via
    * `sources.Partitioned` with `cols = Seq("shard")` yields the
    * size-bounded training files a data loader consumes. */
  def assignShards(df: DataFrame, textCol: String, idCol: String,
      tokensPerShard: Long, numPartitions: Int = 32): DataFrame = {
    require(tokensPerShard >= 1, "tokensPerShard must be >= 1")
    val withToks = df.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_toks"))
    Skew.globalRunningSum(withToks, col(idCol), col("n_toks"),
        numPartitions, outCol = "cum_toks")
      .withColumn("shard",
        floor((col("cum_toks") - col("n_toks")) / tokensPerShard))
      .select(col(idCol), col("n_toks"), col("cum_toks"), col("shard"))
  }

  /** Per-group vocabulary-cardinality profile: distinct tokens and docs
    * per stratum — the "is source X suddenly low-diversity?" gauge next
    * to [[qualityQuantiles]]'s length profile.
    *
    * `exact = false` (the library default) counts tokens with
    * HyperLogLog++ (`approx_count_distinct`, rsd 1%): fixed ~KB sketch
    * state per group, mergeable map-side — at corpus scale an exact
    * distinct-count of tokens is a full (group, token) shuffle of the
    * tokenized corpus, the single widest shuffle a text pipeline can
    * emit. The exact form is the oracle-able verification twin. */
  def cardinalityProfile(df: DataFrame, textCol: String, groupCol: String,
      idCol: String, exact: Boolean = false): DataFrame = {
    val tok = graft.core.FanOut(df).select(col(groupCol), col(idCol),
      explode(tokens(col(textCol))).as("_tok"))
    val distinctTok =
      if (exact) countDistinct(col("_tok"))
      else approx_count_distinct(col("_tok"), 0.01)
    tok.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        distinctTok.as("distinct_tokens"))
  }

  /** Per-group quantile profile of a quality metric — the distribution
    * mart a curation run watches (is src X's length profile drifting?).
    *
    * `exact = false` (the library default, the 100 TB path) uses Spark's
    * `approx_percentile`: a Greenwald–Khanna sketch per group — bounded
    * memory, mergeable map-side, one narrow shuffle of sketches. The
    * exact form materializes every value per group inside the aggregate
    * buffer, which is a per-group memory hazard at corpus scale — it
    * exists as the oracle-able verification twin (both engines interpolate
    * quantiles identically, R-7), and QualityQuantilesSpec bounds the
    * sketch's drift against it. */
  def qualityQuantiles(df: DataFrame, metricCol: String, groupCol: String,
      ps: Seq[Double], exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val pArr = array(ps.map(lit): _*)
    val qs =
      if (exact) percentile(col(metricCol), pArr)
      else percentile_approx(col(metricCol), pArr, lit(accuracy))
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), qs.as("_qs"))
    ps.zipWithIndex.foldLeft(agged) { case (d, (p, i)) =>
      d.withColumn(s"p${(p * 100).round}",
        round(element_at(col("_qs"), i + 1).cast("double"), 4))
    }.drop("_qs")
  }

  /** End-to-end near-dup removal: capped n-gram Jaccard pairs →
    * connected components → canonical doc per cluster ("keep the richest
    * copy": max `qualityCol`, ties to the smallest id). Returns
    * (component, canonical_doc, cluster_size); singletons (docs in no
    * pair) are not emitted — they survive dedup by definition.
    *
    * `idCol` must be an integral type: [[ConnectedComponents]] labels are
    * long node ids (string ids would cast to null and silently collapse
    * the graph), so the contract is checked up front. Map string doc ids
    * to dense longs before calling (e.g. `xxhash64` + collision audit, or
    * a dimension table) — that mapping is a one-time corpus decision the
    * engine should not guess. */
  def dedupClusters(docs: DataFrame, textCol: String, idCol: String,
      qualityCol: String, n: Int = 2, threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame =
    dedupClustersFromPairs(docs,
      confirmedNearDupPairs(docs, textCol, idCol, n, threshold, maxDf),
      idCol, qualityCol)

  /** The confirmed (exact-Jaccard ≥ threshold, df-capped) near-dup pair
    * set [[dedupClusters]] clusters over — exposed so callers can reuse
    * the one edge set for both clustering and pair-membership flags. */
  def confirmedNearDupPairs(docs: DataFrame, textCol: String,
      idCol: String, n: Int = 2, threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame =
    TextDedup.ngramJaccardPairs(docs, textCol, idCol, n, threshold, maxDf)

  /** [[dedupClusters]] over a precomputed (id_a, id_b) pair set. Callers
    * that also need the pair list itself (e.g. a curation ledger's
    * "appears in a near-dup pair" flag) compute pairs once and feed the
    * SAME edge set here — deriving the pair flag and the cluster
    * membership from different similarity graphs silently drops docs
    * whose candidate pair never confirms (paired ∧ ¬clustered). */
  def dedupClustersFromPairs(docs: DataFrame, pairs: DataFrame,
      idCol: String, qualityCol: String): DataFrame =
    dedupClustersFromComponents(docs, dedupComponents(pairs), idCol,
      qualityCol)

  /** [[dedupClustersFromPairs]] over precomputed component labels
    * ([[dedupComponents]]'s output) — the Engine shares one label
    * propagation between this canonical pick and the soft weights. */
  def dedupClustersFromComponents(docs: DataFrame, comp: DataFrame,
      idCol: String, qualityCol: String): DataFrame = {
    // canonical pick via a per-component rank (quality desc, id asc):
    // type-agnostic — no arithmetic negation of the id — and the same
    // shuffle cost as the groupBy it replaces
    val w = Window.partitionBy("component")
      .orderBy(col("_q").desc, col("node"))
    comp.join(docs.select(col(idCol).as("_id"), col(qualityCol).as("_q")),
        comp("node") === col("_id"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .filter(col("_rn") === 1)
      .select(col("component"), col("node").as("canonical_doc"),
        col("cluster_size"))
  }

  /** Soft dedup — the down-weighting alternative to removal
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models": repeated data keeps most of its value for a few epochs,
    * so a curator may prefer reweighting near-dup groups over deleting
    * them): every member of a near-dup cluster gets training weight
    * 1/cluster_size, preserving each group's total mass at
    * approximately one document-equivalent (the stored weight rounds to
    * 4 dp for cross-engine hash stability, so a size-3 cluster sums to
    * 0.9999 and a size-7 one to 1.0003 — consumers needing the exact
    * invariant should recompute 1/cluster_size from the carried
    * cluster_size column). Docs in no cluster are absent (weight 1
    * implicitly — emitting the whole corpus for the common case of few
    * dups would be the expensive path at 100 TB).
    *
    * Same candidate/cluster machinery as [[dedupClusters]] (df-capped
    * confirmed pairs → distributed CC); the size join is one bounded
    * aggregation over cluster members. Returns (idCol, component,
    * cluster_size, weight). */
  def softDedupWeights(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2, threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame =
    softDedupWeightsFromComponents(dedupComponents(
      confirmedNearDupPairs(docs, textCol, idCol, n, threshold, maxDf)),
      idCol)

  /** Connected components of a confirmed (id_a, id_b) pair set —
    * (node, component). Factored out so the Engine runs label
    * propagation ONCE and derives both the canonical pick and the soft
    * weights from the same labels. Integral-id guard as in
    * [[dedupClustersFromPairs]]: a non-ANSI long cast would silently
    * null string ids into one garbage component. */
  def dedupComponents(pairs: DataFrame): DataFrame = {
    val idType = pairs.schema("id_a").dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"connected components need integral pair ids; id_a is " +
        s"${idType.typeName} — map ids to dense longs first")
    ConnectedComponents.labelPropagation(pairs.sparkSession,
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
  }

  /** [[softDedupWeights]] over precomputed component labels
    * ([[dedupComponents]]'s output). */
  def softDedupWeightsFromComponents(comp: DataFrame,
      idCol: String): DataFrame = {
    val sizes = comp.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("component"))
      .select(col("node").as(idCol), col("component"),
        col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 4).as("weight"))
  }

  /** PII patterns for [[redactPii]]. Deliberately restricted to syntax
    * that Java regex (Spark) and RE2 (DuckDB/Go scanners) interpret
    * identically — character classes, bounded repetition, ASCII \b —
    * so the scrub is engine-portable and oracle-checkable. */
  // explicit A-Z ranges, not an (?i) flag: the pattern is interpolated
  // into both Java regex and RE2 call sites, and uppercase emails are
  // PII exactly like lowercase ones — a lowercase-only class silently
  // let "John.Doe@Example.COM" through the scrub
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction — the standard pre-training privacy scrub: replace
    * email / IPv4 / phone-shaped spans with typed placeholder tags and
    * report per-doc match counts (counted on the ORIGINAL text, so the
    * counts survive even when spans overlap a later pattern). Map-only:
    * one narrow projection per row, no shuffle, whole-stage codegen —
    * at 100 TB this runs at scan speed alongside the other per-doc
    * analyses. Emails are scrubbed first so an address can never leak a
    * dotted-quad into the IP pass. Returns
    * (idCol, n_emails, n_ips, n_phones, redacted). */
  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("redacted"))
  }

  /** Per-doc hashed uni+bigram feature buckets (fastText-style: all
    * n-grams share one `dims`-bucket space). Map-only, native
    * ([[graft.expr.QcBucketsExpr]]): the HOF formulation —
    * `transform(concat(toks, zip_with-bigrams), t =>
    * conv(substring(md5(t), 1, 13), 16, 10) % dims)` — is
    * CodegenFallback and allocated a joined string + hex string +
    * conv parse per n-gram; the native expression computes the same
    * md5-prefix buckets (TextDedup's MinHash recipe) in one compiled
    * loop. Bit-equality is pinned by QualityClassifierSpec's
    * native-vs-HOF test and the classifier oracles. */
  private def qcFeatures(toksCol: Column, dims: Int): Column =
    call_function("qc_buckets_native", coalesce(toksCol, array()),
      lit(dims))

  private val QcZero = new java.math.BigDecimal("0.000000000000") // s=12

  /** Hard-sigmoid link on a decimal z: clamp(0.5 + z/4, 0, 1), every
    * step rational (+, ×0.25, clamp) — exact in decimal on BOTH
    * engines, unlike exp(), where JVM StrictMath vs libm can differ in
    * the last ulp and a single flipped bit diverges the training
    * trajectory across engines. */
  private def qcHardSigmoid(z: Column): Column = {
    val zq = (z * lit(new java.math.BigDecimal("0.25"))) // (24,14) exact
    least(greatest(lit(new java.math.BigDecimal("0.5")) + zq,
      lit(0).cast("decimal(24,14)")), lit(1).cast("decimal(24,14)"))
  }

  /** z = Σ_buckets w[b] + w[bias] as one map-side fold over the
    * LITERAL weight vector (no join, no shuffle — the broadcast-apply
    * the classifier ships with). Native ([[graft.expr.QcZExpr]]): the
    * `aggregate(bk, 0, (acc, b) => (acc + element_at(wArr, b + 1))
    * .cast(decimal(20,12)))` HOF was interpreted and boxed a Decimal
    * per step; the native fold adds the same scale-12 exact values as
    * longs in one compiled loop (same (20,12) result by exactness of
    * decimal addition — see QcExpressions' equivalence notes). */
  private def qcZ(bk: Column, w: Array[java.math.BigDecimal]): Column =
    call_function("qc_z_native", bk,
      array(w.map(v => lit(v).cast("decimal(20,12)")): _*))

  /** The labeled training slice: positives = the exemplar rows,
    * pseudo-negatives = a FIXED md5 bucket of the rest (hex window
    * 13..16 of md5(id) — its own window, like every deterministic
    * sampler here, so the pick is independent of [[splitAssign]] and
    * friends; the hash IS the seed). Feature buckets computed once. */
  private def qcLabeled(df: DataFrame, textCol: String, idCol: String,
      isExemplar: Column, dims: Int, negCut: Int): DataFrame = {
    val negHash = conv(substring(md5(col(idCol).cast("string")), 13, 4),
      16, 10).cast("long")
    // FanOut BEFORE the feature hashing: one md5 per uni/bigram is
    // compute-heavy per row, and a single-row-group scan otherwise
    // serializes it on one core (no-op at scale — the guard)
    graft.core.FanOut(df.filter(isExemplar || negHash < negCut)
        .select(col(idCol), when(isExemplar, 1).otherwise(0).as("_y"),
          col(textCol)))
      .select(col(idCol), col("_y"),
        qcFeatures(tokens(col(textCol)), dims).as("_bk"))
  }

  /** Deterministic exemplar-trained quality classifier — the trained
    * quality filter of GPT-3-style curation (Brown et al. 2020,
    * arXiv:2005.14165 Appendix A: a classifier with curated text as
    * positives and raw crawl as negatives; features are fastText-style
    * hashed n-grams, Joulin et al. 2016): logistic regression with the
    * HARD-sigmoid link over `dims`-bucket hashed uni+bigram counts,
    * trained by `iters` FULL-batch gradient steps on the unnormalized
    * sum loss (the learning rate absorbs 1/N) in exact decimal
    * arithmetic — the trainCentroids discipline, so DuckDB recomputes
    * the weights bit-identically: every operation is +, ×, clamp, or
    * round-HALF_UP on exact decimals; no exp, no division.
    *
    * Returns the dims+1 weight vector (index dims = bias) driver-side
    * — a BOUNDED collect (dims+1 rows, data-independent), the k-row
    * trainCentroids state shape. Scale shape: each step is one scan of
    * the labeled slice (cached once with features computed — the slice
    * is exemplar + negCut/65536 of the corpus, not the corpus) feeding
    * a dims-row partial-aggregated shuffle; weights re-enter as a
    * literal array, so no step joins or broadcasts anything
    * data-sized. */
  def trainQualityClassifier(df: DataFrame, textCol: String,
      idCol: String, isExemplar: Column, dims: Int = 64,
      iters: Int = 2, negCut: Int = 6554,
      lr: java.math.BigDecimal = new java.math.BigDecimal("0.000001"),
      init: Option[Array[java.math.BigDecimal]] = None)
      : Array[java.math.BigDecimal] = {
    require(dims >= 1 && iters >= 0, "dims >= 1, iters >= 0")
    require(init.forall(_.length == dims + 1),
      s"init weights must be dims+1 = ${dims + 1} long")
    val labeled = qcLabeled(df, textCol, idCol, isExemplar, dims, negCut)
      .localCheckpoint()
    // `init` makes the trainer resumable: the incremental form carries
    // the weight vector across arrival batches (one step per batch,
    // each over that batch's labeled slice) — the admission-sink
    // pattern with a dims+1-row SNAPSHOT state instead of an index
    var w = init.map(_.clone()).getOrElse(Array.fill(dims + 1)(QcZero))
    (1 to iters).foreach { _ =>
      val r = (qcHardSigmoid(qcZ(col("_bk"), w)) - col("_y")).as("_r")
      // ONE scan per step: appending the bias index to each doc's
      // bucket list makes the bias gradient (one r per doc) fall out
      // of the same explode+sum as the per-bucket gradients
      val grads = labeled
        .select(r, explode(concat(col("_bk"),
          array(lit(dims.toLong)))).as("_b"))
        .groupBy("_b").agg(sum("_r").as("_g"))
        .collect() // bounded: ≤ dims+1 rows, data-independent
        .map(row => row.getLong(0).toInt ->
          // an empty labeled slice sums to NULL — train as zero grad
          Option(row.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
        .toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = grads.getOrElse(j, java.math.BigDecimal.ZERO)
        wj.subtract(lr.multiply(g))
          .setScale(12, java.math.RoundingMode.HALF_UP)
      }
    }
    w
  }

  /** Map-only scoring with the trained weights as a LITERAL array:
    * score = hard-sigmoid(Σ w[bucket(ngram)] + bias), rounded to 6 as
    * a double (the cross-engine comparison grain every cosine here
    * uses). Returns (idCol, score, quality_pass = score ≥ 0.5). No
    * shuffle, no join — scan-speed at 100 TB. */
  def scoreQuality(df: DataFrame, textCol: String, idCol: String,
      weights: Array[java.math.BigDecimal], dims: Int = 64): DataFrame = {
    require(weights.length == dims + 1,
      s"weights must be dims+1 = ${dims + 1} long, got ${weights.length}")
    val score = round(
      qcHardSigmoid(qcZ(qcFeatures(tokens(col(textCol)), dims), weights))
        .cast("double"), 6)
    // stays map-only by contract (QualityClassifierSpec pins the
    // shuffle-free plan); callers whose scan supplies too few
    // partitions FanOut the input themselves (the oracle queries do)
    df.select(col(idCol), score.as("score"))
      .withColumn("quality_pass", col("score") >= 0.5)
  }
}
