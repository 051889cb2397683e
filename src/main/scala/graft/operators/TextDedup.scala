package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Library API for the training-data dedup family (the parameterized form
  * of the TextDedupQueries demonstrations): exact, MinHash+LSH, n-gram
  * Jaccard, SimHash — each returning DataFrames composable with the rest
  * of the engine.
  *
  * All candidate generation is equi-join on a bucket key (content hash,
  * shingle, LSH band bucket) — never an all-pairs product — so every
  * function here scales with data × bucket width, not data².
  */
object TextDedup {

  /** Exact dedup on normalized content: returns input rows + `content_id`
    * + `is_duplicate` (true for every row but the keeper). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("content_id",
      sha2(lower(trim(col(textCol))), 256))
    val w = Window.partitionBy("content_id").orderBy(col(idCol))
    hashed.withColumn("is_duplicate", row_number().over(w) > 1)
  }

  /** Distinct word n-gram shingles per row: (id, shingle). Fans the input
    * out first ([[graft.core.FanOut]]): everything downstream of the
    * shingle explode (min-hash signatures, the inverted index) is
    * compute-bound map work that must not serialize on a single scan
    * split. */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    graft.core.FanOut(df).select(col(idCol).as("id"),
      filter(split(trim(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), explode(expr(
        s"""array_distinct(transform(sequence(0, size(toks) - $n),
           |  i -> concat_ws(' ', slice(toks, i + 1, $n))))""".stripMargin))
        .as("shingle"))

  /** Exact n-gram Jaccard near-duplicate pairs via inverted shingle index.
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    *
    * `maxDf` caps the document frequency of shingles admitted to the
    * inverted index: a shingle shared by k documents emits O(k²) candidate
    * pairs, so one stop-shingle ("of the") in a 100 TB corpus would emit a
    * quadratic pair list. Stop-shingles above the cap are dropped from BOTH
    * the index and the per-doc sizes (standard stop-shingle removal — the
    * jaccard is then exact over the retained shingle vocabulary).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 2, threshold: Double = 0.8,
      maxDf: Int = 10000): DataFrame = {
    val raw = shingles(df, textCol, idCol, n)
    // df-cap via a window count over the shingle partition: one shuffle,
    // against the two a groupBy + equi-join re-derivation would cost
    // localCheckpoint, not cache(): the sibling functions' convention —
    // a cache() here pinned the corpus-scale shingle rows in storage
    // memory with no unpersist (the frame escapes lazily, so there is
    // no safe place to release it); checkpoint blocks are reclaimed by
    // the ContextCleaner once the result goes out of scope
    val sh = raw
      .withColumn("_df",
        count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("_df") <= maxDf).drop("_df").localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.select(col("id").as("id_a"), col("shingle"))
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 2^31−1: Mersenne prime modulus for the affine min-hash family. The
    * field must be SMALL relative to the multipliers: an affine map only
    * permutes (rather than order-preserves) when a·base wraps the modulus
    * many times — a 61-bit field with ≤10-bit multipliers never wrapped,
    * which silently made all k "permutations" pick the same argmin
    * shingle (perfectly correlated signatures). 31-bit values with 31-bit
    * multipliers wrap ~a times while the product stays ≤ 62 bits — exact
    * in both engines' signed-64 arithmetic (DuckDB errors on bigint
    * overflow, Spark wraps: neither may be hit). */
  val MinHashP: Long = 2147483647L

  /** Multiplier / offset of the i-th affine permutation (xxhash and
    * Numerical-Recipes mixing constants reduced into the field; verified
    * unbiased over random shingle-set pairs). */
  def minHashA(i: Int): Long = ((2L * i + 1) * 668265263L) % MinHashP
  def minHashB(i: Int): Long = ((i + 1L) * 1013904223L) % MinHashP

  /** One portable hash per shingle: the top 13 hex chars of md5 as a
    * bigint (Spark `conv(hex,16,10)` and DuckDB `CAST('0x…' AS BIGINT)`
    * agree exactly), reduced into the 31-bit field. */
  def shingleBase(sh: Column): Column =
    conv(substring(md5(sh), 1, 13), 16, 10).cast("long") % lit(MinHashP)

  /** The i-th affine permutation of a base hash:
    * (A_i·base + B_i) mod (2^31−1). */
  def minHashPerm(base: Column, i: Int): Column =
    (lit(minHashA(i)) * base + lit(minHashB(i))) % lit(MinHashP)

  /** MinHash signatures: (id, h0..h{k-1}) via ONE md5 per shingle plus k
    * affine permutations — the classic "one hash, k permutations" family.
    * The md5('i|'||shingle) formulation this replaces hashed every shingle
    * k times, which made signature generation (the scan-side hot loop of
    * dedup at 100 TB) k× more expensive for no extra independence. */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
      n: Int = 2, numHashes: Int = 16): DataFrame = {
    val sh = shingles(df, textCol, idCol, n)
      .withColumn("_base", shingleBase(col("shingle")))
    val aggs = (0 until numHashes).map(i =>
      min(minHashPerm(col("_base"), i)).as(s"h$i"))
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Signature rows (id, h0..h{k-1}) → banded rows (id, sig struct,
    * band, bucket). Bucket key = '|'-joined decimal hashes: long→string
    * formatting is identical across engines and skips a per-band md5. */
  def bandRows(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"h${b * rows + r}"))
      struct(lit(b).as("band"), concat_ws("|", parts: _*).as("bucket"))
    }
    sig.select(col("id"),
      struct((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash+LSH candidate pairs: signatures banded `bands` ways; pairs
    * sharing any band bucket are candidates, scored by matching-hash
    * fraction. Pairs with estimated similarity ≥ threshold survive. */
  def minHashLshPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 2, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Signatures are carried THROUGH the band self-join so candidates and
    // their match score come out of one join — the candidate-join +
    // two-signature-re-join shape costs two extra corpus-wide shuffles.
    // localCheckpoint bounds the lineage so the self-join reads the
    // materialized signatures instead of recomputing the shingle pass
    // per side (numHashes × 32 B per doc — cheap at any scale).
    val sig = minHashSignatures(df, textCol, idCol, n, numHashes)
      .localCheckpoint()
    val banded = bandRows(sig, numHashes, bands)
    // Degenerate-bucket guard: a band bucket holding k ids emits O(k²)
    // candidates. Buckets above the cap (boilerplate / empty docs hashing
    // identically) are dropped — their members still pair through their
    // other, more selective bands. Count on the NARROW (band, bucket)
    // projection then anti-join the tiny hot-bucket list back (AQE
    // broadcasts it): the window-count formulation this replaces shuffled
    // AND sorted the full banded rows — signature structs included — by
    // bucket just to count them.
    val hot = banded.groupBy("band", "bucket").count()
      .filter(col("count") > maxBucketSize).select("band", "bucket")
    val capped = banded.join(hot, Seq("band", "bucket"), "left_anti")
    val matches = (0 until numHashes)
      .map(i => when(col("sig_a").getField(s"h$i") ===
        col("sig_b").getField(s"h$i"), 1).otherwise(0))
      .reduce(_ + _)
    capped.select(col("id").as("id_a"), col("sig").as("sig_a"),
        col("band"), col("bucket"))
      .join(capped.select(col("id").as("id_b"), col("sig").as("sig_b"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first(matches).as("_m"))
      .withColumn("est_similarity", col("_m").cast("double") / numHashes)
      .filter(col("est_similarity") >= threshold)
      .select("id_a", "id_b", "est_similarity")
  }

  /** EXACT n-gram Jaccard pairs via df-ordered prefix filtering — the
    * All-Pairs / PPJoin family (Bayardo et al., WWW'07; Chaudhuri et
    * al.'s SSJoin) as a Spark join pipeline. Same output as the naive
    * inverted-index self-join, WITHOUT the Σ df² blowup:
    *
    *  1. order every document's shingle set by (document frequency asc,
    *     shingle) — one total order shared corpus-wide (within group);
    *  2. index only each set's PREFIX of length |x| − ⌈t·|x|⌉ + 1: for
    *     any pair with J ≥ t, the globally-smallest common shingle
    *     provably sits inside BOTH prefixes, so the prefix×prefix
    *     equi-join loses no qualifying pair;
    *  3. prune candidates whose sizes alone bound J below t
    *     (min ≥ t·max — J ≤ min/max);
    *  4. verify the bounded candidate list exactly
    *     (array_intersect on the full sets — codegen'd, O(pairs·|set|)).
    *
    * The rarest-first order is what makes the join cheap: common
    * shingles almost never appear in any prefix, so the quadratic
    * per-shingle pair emission concentrates on low-df shingles. Returns
    * (id_a, id_b, shared, na, nb, jaccard) — the counts ride along so
    * callers can re-derive the ratio under their own numeric discipline.
    *
    * @param shingleRows (idCol, shingleCol [, groupCols…]) — distinct
    *                    shingles per doc; pairs join within groupCols
    */
  def ngramJaccardPairsPrefix(shingleRows: DataFrame, idCol: String,
      shingleCol: String, groupCols: Seq[String] = Nil,
      threshold: Double = 0.8): DataFrame = {
    val gcols = groupCols.map(col)
    val dfWindow = Window.partitionBy(gcols :+ col(shingleCol): _*)
    val sets = shingleRows
      .withColumn("_df", count(lit(1)).over(dfWindow))
      .groupBy(col(idCol) +: gcols: _*)
      .agg(sort_array(collect_list(struct(col("_df").as("df"),
        col(shingleCol).as("s")))).as("_sorted"))
      .withColumn("_set", expr("transform(_sorted, x -> x.s)"))
      .drop("_sorted")
      .withColumn("_n", size(col("_set")))
      .withColumn("_p",
        (col("_n") - ceil(col("_n") * lit(threshold)) + 1).cast("int"))
      .localCheckpoint()
    val prefix = sets.select(
      (col(idCol).as("_pid") +: gcols :+ col("_n").as("_pn") :+
        posexplode(expr("slice(_set, 1, _p)"))): _*)
      .withColumnRenamed("pos", "_i").withColumnRenamed("col", "_s")
    val joinKeys = groupCols :+ "_s"
    val cand = prefix
      .select((col("_pid").as("id_a") +: col("_pn").as("_na") +:
        col("_i").as("_ia") +: joinKeys.map(col)): _*)
      .join(prefix.select((col("_pid").as("id_b") +:
        col("_pn").as("_nb") +: col("_i").as("_ib") +:
        joinKeys.map(col)): _*), joinKeys)
      .filter(col("id_a") < col("id_b"))
      // size prune: J ≤ min/max, so min < t·max can never qualify
      // (tiny conservative margin keeps the double compare safe)
      .filter(least(col("_na"), col("_nb")).cast("double") >=
        greatest(col("_na"), col("_nb")) * lit(threshold) - lit(1e-9))
      // positional filter (PPJoin): a common shingle at sorted
      // positions (i, j) bounds the overlap by min(i,j) matches
      // before it + itself + min of the suffix lengths after it; the
      // bound holds at EVERY common prefix shingle, so the pair's
      // overlap is at most the MIN over its matched rows — folded
      // into the same aggregation that dedups candidate pairs.
      // J ≥ t needs overlap ≥ t/(1+t)·(na+nb); prune provably-short
      // pairs before the exact verify join. On the synthetic bench
      // corpus (31-word vocab, near-equal doc lengths) prefix
      // positions align pair-wise and the bound rarely bites (~5%
      // overhead, same-window A/B) — the prune pays on real corpora
      // where candidate pairs meet at skewed prefix positions.
      .withColumn("_ub", least(col("_ia"), col("_ib")) + lit(1) +
        least(col("_na") - col("_ia") - 1, col("_nb") - col("_ib") - 1))
      .groupBy("id_a", "id_b")
      .agg(min("_ub").as("_ub"), max("_na").as("_gna"),
        max("_nb").as("_gnb"))
      .filter(col("_ub").cast("double") >=
        (col("_gna") + col("_gnb")) * lit(threshold / (1 + threshold)) -
          lit(1e-9))
      .select("id_a", "id_b")
    cand
      .join(sets.select(col(idCol).as("id_a"), col("_set").as("_sa"),
        col("_n").as("na")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("_set").as("_sb"),
        col("_n").as("nb")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "na", "nb", "jaccard")
  }

  /** [[minHashLshPairs]] with an EXACT-duplicate pre-collapse — the
    * production composition for corpora with heavy verbatim
    * replication (mirrors, crawl re-fetches, boilerplate): collapse
    * identical texts to one representative (sha2 groupBy — map-side
    * combinable), run LSH over representatives only, and reattach the
    * copies as representative→member star edges at similarity 1.0.
    *
    * The returned edge set is connectivity-equivalent to the uncollapsed
    * pair set (identical texts have identical signatures, so a rep-level
    * pair exists iff the member-level pair did), which is the contract
    * the dedup pipeline needs — connected components, canonical picks
    * and cluster sizes come out the same.
    *
    * Why it matters at scale: a text duplicated c times shares every
    * band, so the plain pair join emits O(c²) candidates per duplicate
    * group — a corpus 100× replicated costs ~10000× the pairs. The
    * collapse makes that O(c) star edges plus an LSH pass over DISTINCT
    * texts: measured on the 100× rehearsal this took the pipeline from
    * 121.7× to near-linear. Not a drop-in for [[minHashLshPairs]]
    * itself: the pairwise est_similarity list (the x_minhash_lsh
    * contract) genuinely enumerates member-level pairs; use this where
    * pairs only feed clustering. */
  def minHashLshPairsCollapsed(df: DataFrame, textCol: String,
      idCol: String, n: Int = 2, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    val hashed = df.select(col(idCol).as("_id"),
      sha2(col(textCol), 256).as("_ch"))
    val reps = hashed.groupBy("_ch").agg(min(col("_id")).as("_rep"))
    val members = hashed.join(reps, Seq("_ch"))
    // rep = group min, so star edges are already (id_a < id_b) oriented
    val starEdges = members.filter(col("_id") =!= col("_rep"))
      .select(col("_rep").as("id_a"), col("_id").as("id_b"),
        lit(1.0).as("est_similarity"))
    val repDocs = df.join(
      reps.select(col("_rep").as(idCol)), Seq(idCol), "left_semi")
    minHashLshPairs(repDocs, textCol, idCol, n, numHashes, bands,
      threshold, maxBucketSize)
      .unionByName(starEdges)
  }

  /** Incremental near-dup admission: dedup a DELTA of newly-arrived
    * documents against the persisted signature index of everything
    * already admitted — WITHOUT re-reading admitted text. This is the
    * T-series incremental pattern applied to the dedup family: at 100 TB
    * the corpus is append-only and re-running pair generation over the
    * whole corpus per arrival batch is off the table; the index costs
    * `numHashes` longs per admitted doc and is the only corpus-side
    * state touched.
    *
    * Semantics (deterministic, order-free): a delta doc is rejected when
    * its estimated similarity reaches `threshold` against ANY indexed
    * doc, or against ANY delta doc with a smaller id (ids are the
    * admission order). The second rule compares against earlier delta
    * docs whether or not those are themselves admitted — monotone
    * (growing the delta never un-rejects a doc) and computable without
    * a sequential scan; the full-recompute pipeline (x_dedup_pipeline)
    * remains the compaction path that re-picks canonicals globally.
    *
    * Returns (decisions, admittedSignatures): decisions =
    * (id, dup_of_index, dup_of_delta, keep); admittedSignatures = the
    * kept docs' signature rows — append them to the index and the next
    * batch continues from there. All joins are band-bucket equi-joins
    * with the batch path's hot-bucket cap, counted over BOTH sides so a
    * bucket degenerate in the admitted corpus cannot explode the delta
    * join either. */
  def incrementalMinHashDedup(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String, n: Int = 2, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      maxBucketSize: Int = 10000): (DataFrame, DataFrame) = {
    val deltaSig = minHashSignatures(delta, textCol, idCol, n, numHashes)
      .localCheckpoint()
    val (dbC, ibC) = capHotBuckets(bandRows(deltaSig, numHashes, bands),
      bandRows(index, numHashes, bands), Seq("band", "bucket"),
      maxBucketSize)
    val matches = (0 until numHashes)
      .map(i => when(col("sig_a").getField(s"h$i") ===
        col("sig_b").getField(s"h$i"), 1).otherwise(0))
      .reduce(_ + _)
    def dupsAgainst(b: DataFrame, pred: Column): DataFrame =
      dbC.select(col("id").as("id_a"), col("sig").as("sig_a"),
          col("band"), col("bucket"))
        .join(b.select(col("id").as("id_b"), col("sig").as("sig_b"),
          col("band"), col("bucket")), Seq("band", "bucket"))
        .filter(pred)
        .groupBy("id_a", "id_b")
        .agg(first(matches).as("_m"))
        .filter(col("_m").cast("double") / numHashes >= threshold)
        .select(col("id_a").as("id")).distinct()
    admissionDecisions(delta, idCol, deltaSig,
      dupsAgainst(ibC, lit(true)),
      dupsAgainst(dbC, col("id_a") > col("id_b")))
  }

  /** Drop (band, bucket) groups whose COMBINED two-side population
    * exceeds `maxBucketSize` — the degenerate-bucket guard shared by
    * both incremental admission forms. */
  private def capHotBuckets(db: DataFrame, ib: DataFrame,
      keyCols: Seq[String], maxBucketSize: Int)
      : (DataFrame, DataFrame) = {
    val keys = keyCols.map(col)
    val hot = db.select(keys: _*).unionAll(ib.select(keys: _*))
      .groupBy(keys: _*).count()
      .filter(col("count") > maxBucketSize).select(keys: _*)
    (db.join(hot, keyCols, "left_anti"),
      ib.join(hot, keyCols, "left_anti"))
  }

  /** Shared decision/admission assembly of the incremental dedup forms,
    * given each form's duplicate-id sets. Decisions cover EVERY delta
    * doc, not just the signable ones: a doc with too few tokens has no
    * signature and no duplication evidence at this grain — it is
    * decided keep=true (and is naturally absent from the admitted
    * signature index, which only ever holds signature rows). Without
    * this, short docs vanished from the decision set entirely: never
    * admitted, never flagged, invisible to a caller reconciling
    * decisions against its input batch.
    *
    * `decisions` is localCheckpoint'ed HERE so the expensive candidate
    * joins materialize once however many consumers follow — the sinks
    * previously checkpointed both returned frames and paid the
    * index-sized join twice per micro-batch. */
  private def admissionDecisions(delta: DataFrame, idCol: String,
      deltaSig: DataFrame, dupIx: DataFrame, dupDelta: DataFrame)
      : (DataFrame, DataFrame) = {
    val decisions = delta.select(col(idCol).as("id"))
      .join(dupIx.withColumn("dup_of_index", lit(true)), Seq("id"), "left")
      .join(dupDelta.withColumn("dup_of_delta", lit(true)),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("dup_of_index"), lit(false)).as("dup_of_index"),
        coalesce(col("dup_of_delta"), lit(false)).as("dup_of_delta"))
      .withColumn("keep", !col("dup_of_index") && !col("dup_of_delta"))
      .localCheckpoint()
    val admitted = deltaSig
      .join(decisions.filter(col("keep")).select("id"), Seq("id"))
    (decisions, admitted)
  }

  /** SimHash of configurable bit width (md5-hex bit sampling per token);
    * near-dup pairs = signatures within `maxHamming` bits, candidates via
    * band buckets over the signature. */
  def simHash(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 64): DataFrame = {
    require(bits > 0 && bits <= 64 && bits % 4 == 0)
    val tok = graft.core.FanOut(df).select(col(idCol).as("id"),
      explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
        .as("tok"))
    val withBit = tok.select(col("id"), col("tok"),
      explode(array((0 until bits).map(lit): _*)).as("bit"))
    val hexDigit = instr(lit("0123456789abcdef"),
      substring(md5(col("tok")), (col("bit") / 4).cast("int") + 1, lit(1))) - 1
    val mask = when(pmod(col("bit"), lit(4)) === 0, 8)
      .when(pmod(col("bit"), lit(4)) === 1, 4)
      .when(pmod(col("bit"), lit(4)) === 2, 2).otherwise(1)
    val contrib = when(pmod((hexDigit / mask).cast("int"), lit(2)) === 1, 1)
      .otherwise(-1)
    withBit.groupBy("id", "bit").agg(sum(contrib).as("s"))
      .groupBy("id")
      // Integer shifts, not pow(2.0, n): doubles lose exactness past 2^53
      // and 2^63 overflows the long cast — signatures must be bit-exact
      // or downstream dedup diverges per engine.
      .agg(sum(when(col("s") > 0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${bits - 1} - bit AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** (band, chunk) rows of a (id, simhash) signature set — shared by
    * [[simHashPairs]] and [[incrementalSimHashDedup]]. */
  private def simHashBandRows(sig: DataFrame, bits: Int,
      bands: Int): DataFrame = {
    val width = bits / bands
    // width = 64 (bands = 1): (1L << 64) wraps to 1L under Scala's
    // mod-64 shift — full-width chunks take the all-ones mask explicitly
    val chunkMask = if (width == 64) -1L else (1L << width) - 1
    val chunkCols = (0 until bands).map { b =>
      val chunk = expr(
        s"shiftrightunsigned(simhash, ${b * width}) & $chunkMask")
      struct(lit(b).as("band"), chunk.as("chunk"))
    }
    sig.select(col("id"), col("simhash"),
        explode(array(chunkCols: _*)).as("bc"))
      .select(col("id"), col("simhash"),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
  }

  /** Incremental SimHash near-dup admission — the
    * [[incrementalMinHashDedup]] contract on Hamming-banded signatures,
    * completing the incremental family (MinHash, SemDeDup, substring,
    * BM25, contamination all have one): a delta doc is rejected when
    * its signature is within `maxHamming` bits of ANY indexed doc's, or
    * of ANY delta doc with a smaller id — monotone and order-free, with
    * the batch pipeline remaining the global-compaction path. The index
    * holds (id, simhash) rows only (8 bytes of state per admitted doc —
    * the narrowest of the admission indexes); admitted text is never
    * re-read. Candidates come from the [[simHashPairs]] (band, chunk)
    * equi-join (pigeonhole: bands > maxHamming), hot buckets capped
    * over BOTH sides like the MinHash form. Docs with no tokens have no
    * signature and are decided keep=true, mirroring the short-doc rule.
    *
    * Returns (decisions, admittedSignatures): decisions =
    * (id, dup_of_index, dup_of_delta, keep); admittedSignatures = the
    * kept docs' (id, simhash) rows — append to the index and the next
    * batch continues from there. */
  def incrementalSimHashDedup(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String, bits: Int = 64, bands: Int = 4,
      maxHamming: Int = 3, maxBucketSize: Int = 10000)
      : (DataFrame, DataFrame) = {
    require(bits % bands == 0, "bands must divide bits")
    require(bands > maxHamming,
      "need bands > maxHamming for the pigeonhole guarantee")
    val deltaSig = simHash(delta, textCol, idCol, bits).localCheckpoint()
    val (dbC, ibC) = capHotBuckets(simHashBandRows(deltaSig, bits, bands),
      simHashBandRows(index.select(col("id"), col("simhash")), bits,
        bands), Seq("band", "chunk"), maxBucketSize)
    def dupsAgainst(b: DataFrame, pred: Column): DataFrame =
      dbC.select(col("id").as("id_a"), col("simhash").as("sig_a"),
          col("band"), col("chunk"))
        .join(b.select(col("id").as("id_b"), col("simhash").as("sig_b"),
          col("band"), col("chunk")), Seq("band", "chunk"))
        .filter(pred)
        .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
          <= maxHamming)
        .select(col("id_a").as("id")).distinct()
    admissionDecisions(delta, idCol, deltaSig,
      dupsAgainst(ibC, lit(true)),
      dupsAgainst(dbC, col("id_a") > col("id_b")))
  }

  /** SimHash near-duplicate pairs: candidates via band buckets over the
    * signature (pigeonhole: two signatures within `maxHamming` bits must
    * agree on at least one of `bands` disjoint bit chunks whenever
    * `bands > maxHamming`), verified with an exact popcount of the XOR.
    * Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤ maxHamming.
    *
    * Candidate generation is an equi-join on (band, chunk value) — never
    * all-pairs — so it scales like LSH, with `maxBucketSize` guarding
    * degenerate buckets exactly as in [[minHashLshPairs]].
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 64, bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    require(bands > maxHamming,
      "need bands > maxHamming for the pigeonhole guarantee")
    val sig = simHash(df, textCol, idCol, bits).localCheckpoint()
    val banded = simHashBandRows(sig, bits, bands)
    // bucket cap via window count (one shuffle the self-join reuses)
    val capped = banded
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy("band", "chunk")))
      .filter(col("_n") <= maxBucketSize).drop("_n")
    capped.select(col("id").as("id_a"), col("simhash").as("sig_a"),
        col("band"), col("chunk"))
      .join(capped.select(col("id").as("id_b"), col("simhash").as("sig_b"),
        col("band"), col("chunk")), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
