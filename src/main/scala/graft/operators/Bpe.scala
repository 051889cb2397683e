package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a tokenized corpus — the
  * dictionary-trick formulation of Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units", ACL): pair statistics
  * run on the DISTINCT-WORD table weighted by word frequency, never on
  * the corpus itself.
  *
  * Scale shape: the only corpus-scale pass is the word count (map-side
  * combined groupBy). Every merge round after that touches the bounded
  * vocabulary table: pair counting is a narrow explode of per-word
  * adjacent symbol pairs + one aggregation, the per-round argmax is a
  * single-row TakeOrdered, and merge application is a map-only fold over
  * each word's symbol array. A 100 TB corpus with a 10M-word vocabulary
  * runs every round on 10M rows regardless of corpus size.
  */
object Bpe {

  /** Symbol separator inside the fold accumulator. Tokens are `\s+`-split
    * ([[Corpus.tokens]]), so no symbol can ever contain a tab — which
    * makes `endsWith(Sep + a)` an exact "last symbol == a" test. */
  private val Sep = "\t"

  /** The corpus-scale pass: (word, wc) frequencies, map-side combined. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Corpus.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** A word split to single-character symbols (the round-0 alphabet). */
  def charSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Frequency-weighted adjacent-symbol pair counts over a vocab of
    * (syms: array&lt;string&gt;, wc). Single-symbol words carry no pairs.
    * Returns (pair_a, pair_b, cnt). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("wc"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"),
        col("syms"))
      .select(col("wc"), element_at(col("syms"), col("i")).as("pair_a"),
        element_at(col("syms"), col("i") + 1).as("pair_b"))
      .groupBy("pair_a", "pair_b").agg(sum("wc").as("cnt"))

  /** One merge rule applied left-to-right, non-overlapping: every
    * adjacent (a, b) in the symbol array becomes the single symbol a||b
    * — reference BPE's greedy order (an occurrence consumed by a merge
    * cannot start the next one). The fold accumulator is a Sep-joined
    * string; replacing a trailing `a` with `a||b` is just appending `b`,
    * so the fold is one string compare + concat per symbol. */
  def applyMerge(syms: Column, a: Column, b: Column): Column = {
    val folded = aggregate(
      slice(syms, lit(2), size(syms) - 1),
      element_at(syms, 1),
      (acc, x) =>
        when((acc === a || acc.endsWith(concat(lit(Sep), a))) && x === b,
          concat(acc, x))
          .otherwise(concat(acc, lit(Sep), x)))
    // ≤1 symbol: nothing to merge — and the empty case must not reach
    // element_at(…, 1), which is an ANSI out-of-bounds error
    when(size(syms) <= 1, syms).otherwise(split(folded, Sep))
  }

  /** Learn `merges` rules from the corpus. Each round's argmax collects
    * exactly one row to the driver (bounded by construction) and the
    * vocab localCheckpoints so plans don't nest `merges` deep. Returns
    * the ordered merge table (rank, pair_a, pair_b, cnt); stops early if
    * the vocabulary runs out of pairs. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, "merges >= 1")
    val spark = df.sparkSession
    var vocab = wordCounts(df, textCol)
      .select(col("wc"), charSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    for (r <- 1 to merges if !done) {
      // count ties break by pair strings. CAVEAT: Spark compares
      // strings by UTF-16 code unit, DuckDB by UTF-8 byte — the two
      // orders agree for ASCII and the Basic Multilingual Plane below
      // the surrogate range, but DIVERGE when a supplementary-plane
      // symbol (U+10000+) ties against U+E000..U+FFFF. The bundled
      // corpora are ASCII; training on text where such ties are
      // plausible needs an engine-stable key (e.g. hex(encode(pair,
      // 'UTF-8'))) on both sides instead.
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair_a"), col("pair_b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((r, a, b, top(0).getLong(2)))
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), lit(a), lit(b)))
          .localCheckpoint()
      }
    }
    spark.createDataFrame(learned.result())
      .toDF("rank", "pair_a", "pair_b", "cnt")
  }

  /** Segment a vocab of (syms, ...) with an ordered merge list: rule i
    * is applied to completion before rule i+1 (reference BPE encode
    * order). Map-only — one chained fold per word; the plan
    * localCheckpoints every `checkpointEvery` rules because a real
    * merge table is 10k+ rules and an unbroken 10k-deep expression
    * tree dies in the analyzer/codegen long before execution (the same
    * reason [[train]] checkpoints per round). */
  def segment(vocab: DataFrame, merges: Seq[(String, String)],
      checkpointEvery: Int = 32): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    merges.zipWithIndex.foldLeft(vocab) { case (v, ((a, b), i)) =>
      val next = v.withColumn("syms", applyMerge(col("syms"), lit(a), lit(b)))
      if ((i + 1) % checkpointEvery == 0 && i + 1 < merges.size)
        next.localCheckpoint()
      else next
    }
  }
}
