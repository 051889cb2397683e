package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-corpus curation operators — the composition layer over the
  * dedup/similarity/text-analysis families: composite quality filtering
  * (Gopher/C4-style rule stacks), deterministic hash sampling,
  * benchmark-contamination checks, and the end-to-end dedup pipeline
  * (near-dup pairs → connected components → canonical selection).
  *
  * Scale design notes per operator are inline; the common rules:
  * rule stacks and hash sampling are map-only (no shuffle), the
  * contamination index broadcasts (benchmark suites are bounded), and
  * pair generation everywhere rides the capped library forms
  * ([[TextDedup.ngramJaccardPairs]], [[Similarity.signLshPairs]]) whose
  * candidate joins are bucket equi-joins, never all-pairs.
  */
object CorpusQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Shared tokenizer: any-whitespace (`\s+`) split, empties dropped —
    * the same regex family [[Corpus.tokens]] and [[TextDedup.shingles]]
    * use, so the oracle agrees on tabs/newlines too, not just the
    * single-space text of the bench corpus. */
  private val toksSql =
    """SELECT doc_id, source, n_chars,
      |       list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                   x -> x <> '') AS toks
      |FROM documents""".stripMargin

  /** The `sig`/`bands` half of [[minhashCteSql]] — callers that already
    * carry a `raw` shingle CTE (e.g. x_lsh_recall sharing one `raw`
    * between the exact-pair and signature chains) splice this alone. */
  private[operators] val minhashSigBandsSql: String =
    s"""sig AS (
       |  SELECT doc_id,
       |         ${(0 until 16).map(i =>
      s"min((${TextDedup.minHashA(i)} * base + " +
        s"${TextDedup.minHashB(i)}) % ${TextDedup.MinHashP}) AS h$i")
      .mkString(", ")}
       |  FROM (SELECT doc_id,
       |               CAST('0x' || substr(md5(shingle), 1, 13) AS BIGINT)
       |                 % ${TextDedup.MinHashP} AS base
       |        FROM raw)
       |  GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT doc_id,
       |           unnest([0, 1, 2, 3]) AS band,
       |           unnest([${(0 until 4).map(b =>
      (0 until 4).map(r => s"CAST(h${4 * b + r} AS VARCHAR)")
        .mkString(" || '|' || ")).mkString(", ")}]) AS bucket
       |    FROM sig))""".stripMargin

  /** Shared DuckDB CTEs `raw`/`sig`/`bands`: 2-shingles → one md5 base
    * hash → 16 affine-permutation MinHash signature → 4-band bucket rows
    * over `documents` — must stay arithmetic-identical to
    * [[TextDedup.minHashSignatures]] / [[TextDedup.bandRows]]. */
  private val minhashCteSql: String =
    s"""raw AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(1, len(toks)),
       |                          i -> toks[i] || ' ' || toks[i+1]))) AS shingle
       |  FROM (SELECT doc_id,
       |               list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                           x -> x <> '') AS toks
       |        FROM documents) WHERE len(toks) >= 2),
       |$minhashSigBandsSql""".stripMargin

  /** Inline (doc_id, toks) subquery over `documents` for [[ccCteSql]]
    * callers that cluster the whole table. */
  private val docToksSub =
    """(SELECT doc_id,
      |               list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                           x -> x <> '') AS toks
      |        FROM documents)""".stripMargin

  /** Shared DuckDB CTE chain `raw`→`keepsh`→`sh`→`sizes`→`cand`→`edges`:
    * bigram shingles from `tokSrc` (any relation or subquery yielding
    * (doc_id, toks)), df-capped inverted index, exact-Jaccard ≥ 0.5
    * pair edges (src &lt; dst) — arithmetic-identical to
    * [[Corpus.confirmedNearDupPairs]]. */
  private def exactPairsCteSql(tokSrc: String, maxDf: Int): String =
    s"""raw AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(1, len(toks)),
       |                          i -> toks[i] || ' ' || toks[i+1]))) AS shingle
       |  FROM $tokSrc WHERE len(toks) >= 2),
       |keepsh AS (SELECT shingle FROM raw GROUP BY shingle
       |           HAVING count(*) <= $maxDf),
       |sh AS (SELECT raw.doc_id, raw.shingle
       |       FROM raw JOIN keepsh USING (shingle)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT p.id_a AS src, p.id_b AS dst
       |  FROM cand p
       |  JOIN sizes sa ON sa.doc_id = p.id_a
       |  JOIN sizes sb ON sb.doc_id = p.id_b
       |  WHERE CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared) >= 0.5)"""
      .stripMargin

  /** [[exactPairsCteSql]] + `sym`→`lbl`→`comp` recursive min-label
    * connected components (ConnectedComponents' twin). Used by
    * x_dedup_pipeline, x_soft_dedup, and x_curation_ledger; the caller's
    * WITH must be RECURSIVE. */
  private def ccCteSql(tokSrc: String, maxDf: Int): String =
    s"""${exactPairsCteSql(tokSrc, maxDf)},
       |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |lbl(node, comp, i) AS (
       |  SELECT src AS node, src AS comp, 0 AS i
       |  FROM (SELECT DISTINCT src FROM sym)
       |  UNION ALL
       |  SELECT s.src AS node, min(l.comp) AS comp, l.i + 1 AS i
       |  FROM lbl l JOIN sym s ON l.node = s.dst
       |  WHERE l.i < 100
       |  GROUP BY s.src, l.i),
       |comp AS (SELECT node, min(comp) AS component FROM lbl GROUP BY node)""".stripMargin

  /** Estimated-similarity predicate text over two `sig` aliases: the
    * matching-hash fraction ≥ threshold, exactly as the Spark side
    * scores candidates. */
  private[operators] def minhashSimSql(a: String, b: String, th: Double): String =
    s"""CAST((${(0 until 16).map(i =>
      s"CASE WHEN $a.h$i = $b.h$i THEN 1 ELSE 0 END").mkString(" + ")})
       | AS DOUBLE) / 16 >= $th""".stripMargin

  /** 32-bit sign-LSH signature over integer-quantized embeddings, as
    * DuckDB SQL — must stay bit-identical to
    * [[Similarity.signLshPairs]]'s plane/weight arithmetic. */
  private def sigSqlBits(bits: Int): String = (0 until bits).map { j =>
    s"""(CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
       |  i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
       |       * ((((i - 1) * 31 + ${j * 17}) % 7) - 3))) > 0
       | THEN ${1L << j} ELSE 0 END)""".stripMargin.replace("\n", " ")
  }.mkString("(", " + ", ")")

  private val sigSql: String = sigSqlBits(32)

  private val dotSql =
    "list_sum(list_transform(range(1, len(a.embedding) + 1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"

  private val normSql = (side: String) =>
    s"sqrt(list_sum(list_transform($side.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  override val entries: Seq[QueryEntry] = Seq(
    // Gopher-style composite quality rule stack (word-count bounds, mean
    // word length, lexical diversity, stopword presence) — one map-only
    // pass, whole-stage-codegen'd; at 100 TB this is scan-bound with zero
    // shuffle. Each rule surfaces as its own flag so downstream can
    // attribute rejections (the way quality-filter ablations need).
    q("x_gopher_quality",
      s"""WITH t AS ($toksSql)
         |SELECT doc_id,
         |  len(toks) AS n_words,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(round(CAST(list_sum(list_transform(toks, x -> len(x)))
         |           AS DOUBLE) / len(toks), 4) AS DOUBLE) END AS mean_word_len,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks),
         |           4) AS DOUBLE) END AS distinct_ratio,
         |  len(toks) BETWEEN 5 AND 10000 AS word_count_ok,
         |  len(toks) > 0 AND
         |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         |      / len(toks) BETWEEN 2 AND 12 AS word_len_ok,
         |  len(toks) > 0 AND
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
         |    AS diversity_ok,
         |  len(list_filter(toks,
         |      x -> x IN ('the','a','of','el','le','der'))) > 0
         |    AS stopword_ok,
         |  (len(toks) BETWEEN 5 AND 10000)
         |    AND (len(toks) > 0 AND
         |      CAST(list_sum(list_transform(toks, x -> len(x)))
         |           AS DOUBLE) / len(toks) BETWEEN 2 AND 12)
         |    AND (len(toks) > 0 AND
         |      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3)
         |    AND (len(list_filter(toks,
         |           x -> x IN ('the','a','of','el','le','der'))) > 0)
         |    AS passes
         |FROM t ORDER BY doc_id""") {
      (s, dir) =>
      Corpus.qualityFlags(docs(s, dir), "text")
        .select("doc_id", "n_words", "mean_word_len", "distinct_ratio",
          "word_count_ok", "word_len_ok", "diversity_ok", "stopword_ok",
          "passes")
        .orderBy("doc_id")
    },

    // Deterministic hash sampling: keep rows whose md5(doc_id) prefix
    // falls under the rate bound — reproducible across engines, runs,
    // and cluster sizes (unlike rand()-based sample()), and map-only.
    // '1a'/'100' hex ≈ a 10.2% rate.
    q("x_hash_sample",
      """SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.hashSample(docs(s, dir), "doc_id", "1a")
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 2).as("bucket"))
        .orderBy("doc_id")
    },

    // Stratified sampling: k docs per stratum, selected by hash order so
    // the sample is deterministic. The per-stratum window is fine while
    // strata are numerous and bounded (sources, languages); for a handful
    // of corpus-scale strata use the sc3_topk_per_key two-phase shape
    // (per-partition top-k, then merge) to avoid one task per stratum.
    q("x_stratified_sample",
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY source, doc_id""") { (s, dir) =>
      Corpus.stratifiedSample(docs(s, dir), "source", "doc_id", 20)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    },

    // Benchmark-contamination check: fraction of a doc's distinct 3-gram
    // shingles that appear anywhere in the benchmark set (here the
    // doc_id % 97 == 0, doc_id < 5000 subset standing in for an eval
    // suite — the < 5000 bound keeps the benchmark CONSTANT-SIZE under
    // ScaleGen's stride-shifted clones, like a real eval suite that does
    // not grow with the corpus; without it the 10x rehearsal measured
    // the benchmark side 10x-ing, which is not this operator's shape).
    // The benchmark VOCABULARY is the broadcast side — eval suites are
    // bounded (millions of shingles, not corpus-scale) — so the corpus
    // side streams map-side with no shuffle for the membership test;
    // the corpus is shingled ONCE and a single per-doc aggregation
    // counts totals and hits together (no semi-then-rejoin double pass).
    q("x_contamination",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |           list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        |           AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |bench AS (SELECT DISTINCT shingle FROM sh
        |          WHERE doc_id % 97 = 0 AND doc_id < 5000),
        |tot AS (SELECT doc_id, count(*) AS n_sh FROM sh
        |        WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)
        |        GROUP BY doc_id),
        |hit AS (SELECT s.doc_id, count(*) AS n_hit
        |        FROM sh s JOIN bench b USING (shingle)
        |        WHERE NOT (s.doc_id % 97 = 0 AND s.doc_id < 5000)
        |        GROUP BY s.doc_id)
        |SELECT h.doc_id, h.n_hit,
        |       CAST(round(CAST(h.n_hit AS DOUBLE) / t.n_sh, 4) AS DOUBLE)
        |         AS contamination,
        |       CAST(h.n_hit AS DOUBLE) / t.n_sh >= 0.8 AS contaminated
        |FROM hit h JOIN tot t USING (doc_id)
        |ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      Corpus.contamination(
          corpus = d.filter(!isBench),
          benchmark = d.filter(isBench),
          "text", "doc_id", n = 3, flagAt = 0.8)
        .orderBy("doc_id")
    },

    // Incremental contamination screening (the x_incremental_dedup
    // admission pattern applied to the benchmark screen): the benchmark
    // vocabulary persists as an index, arrival batches shingle ONCE and
    // broadcast-test against it, and a newly-registered eval suite
    // between batches appends exactly its missing shingles
    // (extendBenchmarkVocab left-anti). Phase 1 screens the even
    // arrivals against suite A's vocab; suite B registers; phase 2
    // screens the odd arrivals against A∪B — so the oracle gates BOTH
    // the per-batch screen and the index-extension contract (a phase-2
    // doc can be contaminated only via B's shingles; phase-1 results
    // ignore B entirely).
    q("x_incremental_contamination",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |           list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        |           AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |marks AS (
        |  SELECT *,
        |    (doc_id % 97 = 0 AND doc_id < 5000) AS is_a,
        |    (doc_id % 89 = 0 AND doc_id < 5000
        |      AND NOT (doc_id % 97 = 0)) AS is_b
        |  FROM sh),
        |va AS (SELECT DISTINCT shingle FROM marks WHERE is_a),
        |vab AS (SELECT DISTINCT shingle FROM marks WHERE is_a OR is_b),
        |corp AS (SELECT doc_id, shingle FROM marks
        |         WHERE NOT is_a AND NOT is_b),
        |tot AS (SELECT doc_id, count(*) AS n_sh FROM corp GROUP BY doc_id),
        |hit1 AS (SELECT c.doc_id, count(*) AS n_hit
        |         FROM corp c JOIN va USING (shingle)
        |         WHERE c.doc_id % 2 = 0 GROUP BY c.doc_id),
        |hit2 AS (SELECT c.doc_id, count(*) AS n_hit
        |         FROM corp c JOIN vab USING (shingle)
        |         WHERE c.doc_id % 2 = 1 GROUP BY c.doc_id),
        |ph AS (
        |  SELECT 1 AS batch, doc_id, n_hit FROM hit1
        |  UNION ALL
        |  SELECT 2 AS batch, doc_id, n_hit FROM hit2)
        |SELECT b.batch, b.doc_id, b.n_hit,
        |       CAST(round(CAST(b.n_hit AS DOUBLE) / t.n_sh, 4) AS DOUBLE)
        |         AS contamination,
        |       CAST(b.n_hit AS DOUBLE) / t.n_sh >= 0.8 AS contaminated
        |FROM ph b JOIN tot t USING (doc_id)
        |ORDER BY batch, doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val isA = pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      val isB = pmod(col("doc_id"), lit(89)) === 0 &&
        col("doc_id") < 5000 && !(pmod(col("doc_id"), lit(97)) === 0)
      val arrivals = d.filter(!isA && !isB)
      val indexA = Corpus.benchmarkVocab(d.filter(isA), "text", "doc_id")
      val out1 = Corpus.incrementalContamination(
          arrivals.filter(pmod(col("doc_id"), lit(2)) === 0), indexA,
          "text", "doc_id")
        .withColumn("batch", lit(1))
      val indexAB = indexA.unionAll(
        Corpus.extendBenchmarkVocab(indexA, d.filter(isB),
          "text", "doc_id"))
      val out2 = Corpus.incrementalContamination(
          arrivals.filter(pmod(col("doc_id"), lit(2)) === 1), indexAB,
          "text", "doc_id")
        .withColumn("batch", lit(2))
      out1.unionByName(out2)
        .select(col("batch"), col("doc_id"), col("n_hit"),
          col("contamination"), col("contaminated"))
        .orderBy("batch", "doc_id")
    },

    // End-to-end dedup pipeline: capped n-gram Jaccard pairs (the
    // scale-safe library form) → connected components over the pair
    // graph → canonical document per cluster (max n_chars, ties to the
    // smallest doc_id — "keep the richest copy"). This is the full
    // near-dup REMOVAL dataflow a curation run executes, demonstrating
    // that the pair generator, the distributed CC, and quality-based
    // survivor selection compose. Oracle: same pairs in SQL + the d2
    // bounded min-label recursive CTE + a window for the survivor.
    q("x_dedup_pipeline",
      s"""WITH RECURSIVE ${ccCteSql(docToksSub, 40)},
        |ranked AS (
        |  SELECT component, node AS canonical_doc,
        |         row_number() OVER (PARTITION BY component
        |           ORDER BY d.n_chars DESC, node) AS rn,
        |         count(*) OVER (PARTITION BY component) AS cluster_size
        |  FROM comp JOIN documents d ON d.doc_id = comp.node)
        |SELECT component, canonical_doc, cluster_size
        |FROM ranked WHERE rn = 1 ORDER BY component""") {
      (s, dir) =>
      Corpus.dedupClusters(docs(s, dir), "text", "doc_id", "n_chars",
          n = 2, threshold = 0.5, maxDf = 40)
        .orderBy("component")
    },

    // LSH candidate-recall gauge — the text twin of x_ann_recall: per
    // SAMPLED anchor doc (doc_id % 10 = 0, the probe-subset discipline
    // of the ANN recall gauges), what fraction of its TRUE near-dup
    // neighbors the MinHash+LSH path (16 hashes, 4 bands, est ≥ 0.5)
    // also surfaces. Ground truth is the UNCAPPED exact-Jaccard ≥ 0.5
    // pass with the anchor filter PUSHED INTO the inverted-index join's
    // probe side: a df-capped truth would measure Jaccard over a
    // DIFFERENT (rarer) shingle vocabulary than the one MinHash
    // estimates and report the cap's similarity drift as LSH misses
    // (an early draft did exactly that: recall 0.01 at sf0.1), while an
    // UNSAMPLED uncapped truth is the full naive quadratic pass (a
    // second draft spent 11 minutes there at 10×). The truth is a
    // BROADCAST CROSS of the sampled anchors against per-doc shingle
    // SETS with a codegen'd array_intersect: the inverted pair join —
    // whose emission is Σ_shingle df_anchor·df, quadratic in
    // duplication (302 s at 10× measured) — disappears entirely; the
    // cross is |anchors|·n cheap in-memory popcount-style rows with no
    // exchange, and the broadcast side is bounded by the sampling rate.
    // A SIZE-RATIO prune (Jaccard ≥ J implies 2·min(n_a,n_b) ≥
    // max(n_a,n_b) at J = 0.5 — shared ≤ min and union ≥ max) skips the
    // intersection where it cannot reach the threshold; both are exact
    // implications that change no output row. The est side is the REAL
    // library path — hot-bucket cap included — and the oracle mirrors
    // the cap in its mcand CTE (an uncapped oracle would silently
    // diverge the moment a (band,bucket) tops 10000 docs, and an
    // uncapped Spark est is itself quadratic at 10×: 324 s measured).
    // The recall mart is what sizes the band/hash tradeoff before a
    // 100 TB run commits to the approximate pipeline.
    q("x_lsh_recall",
      s"""WITH $minhashCteSql,
         |dsets AS (SELECT doc_id, list(shingle) AS sset, count(*) AS n
         |          FROM raw GROUP BY doc_id),
         |truth AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM dsets a JOIN dsets b
         |    ON a.doc_id % 10 = 0 AND a.doc_id < 100000
         |   AND a.doc_id <> b.doc_id
         |   AND 2 * least(a.n, b.n) >= greatest(a.n, b.n)
         |   AND CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
         |       / (a.n + b.n - len(list_intersect(a.sset, b.sset))) >= 0.5),
         |okbkt AS (SELECT band, bucket FROM bands GROUP BY 1, 2
         |          HAVING count(*) <= 10000),
         |cbands AS (SELECT bands.* FROM bands JOIN okbkt
         |           USING (band, bucket)),
         |mcand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM cbands a JOIN cbands b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |   AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.id_a, c.id_b FROM mcand c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b
         |  WHERE ${minhashSimSql("sa", "sb", 0.5)})
         |SELECT t.a_id AS doc_a, count(*) AS n_true,
         |       count(e.id_a) AS hits,
         |       CAST(round(CAST(count(e.id_a) AS DOUBLE) / count(*), 4)
         |            AS DOUBLE) AS recall
         |FROM truth t
         |LEFT JOIN est e ON e.id_a = least(t.a_id, t.b_id)
         |               AND e.id_b = greatest(t.a_id, t.b_id)
         |GROUP BY t.a_id ORDER BY t.a_id""") { (s, dir) =>
      val d = docs(s, dir)
      val sh = TextDedup.shingles(d, "text", "doc_id", 2).localCheckpoint()
      // the truth rides vocab-indexed BITMAPS: shingles get dense ids
      // (the bigram vocab is tiny next to the corpus — ~1k here; the
      // broadcast dimension is vocab-sized, not corpus-sized), each doc
      // folds to ceil(|vocab|/64) longs, and shared counts are
      // zip_with + bit_count over primitive arrays — the whole anchor ×
      // corpus cross stays inside whole-stage codegen with no exchange
      // (a string-array array_intersect variant of the same cross spent
      // 681 s at 10× on row materialization alone)
      val vocab = sh.select("shingle").distinct()
        .withColumn("idx",
          row_number().over(Window.orderBy("shingle")) - 1)
      val nWords = (vocab.count() + 63) / 64
      val wordRows = sh.join(broadcast(vocab), "shingle")
        .withColumn("w", (col("idx") / 64).cast("int"))
        .withColumn("bit", pmod(col("idx"), lit(64)).cast("int"))
        .groupBy(col("id"), col("w"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("word"))
      val bm = wordRows.groupBy("id")
        .agg(map_from_entries(collect_list(struct(col("w"), col("word"))))
          .as("wm"))
        .withColumn("bm", expr(
          s"transform(sequence(0, ${nWords - 1}), " +
            "i -> coalesce(try_element_at(wm, CAST(i AS INT)), " +
            "CAST(0 AS BIGINT)))"))
        .withColumn("n", expr(
          "aggregate(bm, 0, (acc, x) -> acc + bit_count(x))"))
        .select("id", "bm", "n")
        .localCheckpoint()
      // the anchor set collects into one broadcast of PRIMITIVE arrays
      // and each partition runs a tight JIT'd popcount loop over it —
      // the anchor × corpus cross never exists as rows, and the inner
      // 16-word AND/bit_count costs nanoseconds (the same cross through
      // interpreted higher-order-function lambdas spent 92 s at 10×,
      // through materialized join rows 100+ s). The broadcast is
      // ABSOLUTELY bounded: anchors are the %10 sample RESTRICTED to
      // doc_id < 100000 (mirrored in the oracle), so the driver collect
      // holds at most 10k bitmap rows no matter how large the corpus —
      // the relative rate alone would scale the collect with the data.
      import s.implicits._
      val anchorIdCap = 100000L
      val bmT = bm.select(col("id").cast("long"), col("bm"),
        col("n").cast("int")).as[(Long, Array[Long], Int)]
      val anchorRows = bmT
        .filter(r => r._1 % 10 == 0 && r._1 < anchorIdCap)
        .collect().sortBy(_._1)
      val bcAnchors = s.sparkContext.broadcast(anchorRows)
      val truth = bmT.mapPartitions { it =>
        val anchors = bcAnchors.value
        it.flatMap { case (bId, bbm, nb) =>
          val out = Vector.newBuilder[(Long, Long)]
          var i = 0
          while (i < anchors.length) {
            val (aId, abm, na) = anchors(i)
            if (aId != bId &&
                2 * math.min(na, nb) >= math.max(na, nb)) {
              var shared = 0
              var w = 0
              while (w < abm.length) {
                shared += java.lang.Long.bitCount(abm(w) & bbm(w))
                w += 1
              }
              if (shared.toDouble / (na + nb - shared) >= 0.5)
                out += ((aId, bId))
            }
            i += 1
          }
          out.result()
        }
      }.toDF("a_id", "b_id")
      val est = TextDedup.minHashLshPairs(d, "text", "doc_id")
        .select(col("id_a"), col("id_b")).withColumn("_hit", lit(1))
      truth
        .join(est, least(col("a_id"), col("b_id")) === col("id_a") &&
          greatest(col("a_id"), col("b_id")) === col("id_b"), "left")
        .groupBy("a_id")
        .agg(count(lit(1)).as("n_true"), count(col("_hit")).as("hits"))
        .select(col("a_id").as("doc_a"), col("n_true"), col("hits"),
          round(col("hits").cast("double") / col("n_true"), 4)
            .cast("double").as("recall"))
        .orderBy("doc_a")
    },

    // Soft dedup (Muennighoff et al. 2023): reweight near-dup clusters
    // instead of deleting them — each member gets 1/cluster_size, so a
    // group's total training mass stays one document-equivalent. Same
    // pair/CC machinery as x_dedup_pipeline; docs in no cluster are
    // implicitly weight-1 and not emitted.
    q("x_soft_dedup",
      s"""WITH RECURSIVE ${ccCteSql(docToksSub, 40)},
        |cs AS (SELECT component, count(*) AS cluster_size
        |       FROM comp GROUP BY component)
        |SELECT c.node AS doc_id, c.component, s.cluster_size,
        |       CAST(round(1.0 / s.cluster_size, 4) AS DOUBLE) AS weight
        |FROM comp c JOIN cs s USING (component)
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.softDedupWeights(docs(s, dir), "text", "doc_id",
          n = 2, threshold = 0.5, maxDf = 40)
        .orderBy("doc_id")
    },

    // THE END-TO-END ARTIFACT under the hash gate: the per-doc curation
    // ledger Engine.runCorpusPipeline exports (quality verdict, split,
    // PII spans, confirmed-pair flag, canonical flag, soft-dedup
    // weight, contamination, and the composed keep decision) — every
    // component has its own oracled query above/below; this row proves
    // the COMPOSITION byte-for-byte. Engine defaults: bigram pairs at
    // Jaccard ≥ 0.5 with maxDf 10000, 3-gram contamination flagged at
    // 0.8, md5 splits at 80/10/10 — except the stop-shingle cap, which
    // runs at 40 (the pipeline query's setting): this corpus's 31-word
    // vocabulary makes every bigram corpus-wide, so the default 10000
    // cap would hand both engines a quadratic candidate join.
    q("x_curation_ledger",
      s"""WITH RECURSIVE corpus AS (
         |  SELECT * FROM documents
         |  WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)),
         |t AS (SELECT doc_id,
         |             list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                         x -> x <> '') AS toks
         |      FROM corpus),
         |qual AS (SELECT doc_id,
         |  (len(toks) BETWEEN 5 AND 10000)
         |    AND (len(toks) > 0 AND
         |      CAST(list_sum(list_transform(toks, x -> len(x)))
         |           AS DOUBLE) / len(toks) BETWEEN 2 AND 12)
         |    AND (len(toks) > 0 AND
         |      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3)
         |    AND (len(list_filter(toks,
         |           x -> x IN ('the','a','of','el','le','der'))) > 0)
         |    AS passes
         |  FROM t),
         |spl AS (SELECT doc_id,
         |  CASE WHEN h < 52429 THEN 'train'
         |       WHEN h < 58982 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |               AS BIGINT) AS h FROM corpus)),
         |pii AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Corpus.EmailRe}')) +
         |       len(regexp_extract_all(text, '${Corpus.Ipv4Re}')) +
         |       len(regexp_extract_all(text, '${Corpus.PhoneRe}'))
         |       AS BIGINT) AS pii_spans
         |  FROM corpus),
         |${ccCteSql("t", 40)},
         |paired AS (SELECT DISTINCT doc_id FROM
         |  (SELECT src AS doc_id FROM edges
         |   UNION ALL SELECT dst FROM edges)),
         |cs AS (SELECT component, count(*) AS cluster_size
         |       FROM comp GROUP BY component),
         |canon AS (SELECT node FROM (
         |  SELECT comp.node, row_number() OVER (PARTITION BY component
         |           ORDER BY d.n_chars DESC, comp.node) AS rn
         |  FROM comp JOIN corpus d ON d.doc_id = comp.node) WHERE rn = 1),
         |soft AS (SELECT c.node AS doc_id,
         |                CAST(round(1.0 / s.cluster_size, 4) AS DOUBLE)
         |                  AS weight
         |         FROM comp c JOIN cs s USING (component)),
         |sh3 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |           list_transform(range(1, len(toks) - 1),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
         |           AS shingle
         |  FROM (SELECT doc_id,
         |          list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                      x -> x <> '') AS toks
         |        FROM documents) WHERE len(toks) >= 3),
         |bench AS (SELECT DISTINCT shingle FROM sh3
         |          WHERE doc_id % 97 = 0 AND doc_id < 5000),
         |ctot AS (SELECT doc_id, count(*) AS n_sh FROM sh3
         |         WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)
         |         GROUP BY doc_id),
         |chit AS (SELECT s.doc_id, count(*) AS n_hit
         |         FROM sh3 s JOIN bench b USING (shingle)
         |         WHERE NOT (s.doc_id % 97 = 0 AND s.doc_id < 5000)
         |         GROUP BY s.doc_id),
         |contam AS (SELECT h.doc_id,
         |                  CAST(h.n_hit AS DOUBLE) / t2.n_sh >= 0.8
         |                    AS contaminated
         |           FROM chit h JOIN ctot t2 USING (doc_id))
         |SELECT q.doc_id, q.passes, s.split, p.pii_spans,
         |       (pd.doc_id IS NOT NULL) AS near_dup_paired,
         |       (cn.node IS NOT NULL) AS is_canonical,
         |       COALESCE(sw.weight, 1.0) AS soft_weight,
         |       COALESCE(cm.contaminated, FALSE) AS contaminated,
         |       q.passes AND NOT COALESCE(cm.contaminated, FALSE)
         |         AND (pd.doc_id IS NULL OR cn.node IS NOT NULL) AS keep
         |FROM qual q
         |JOIN spl s USING (doc_id)
         |JOIN pii p USING (doc_id)
         |LEFT JOIN paired pd USING (doc_id)
         |LEFT JOIN canon cn ON cn.node = q.doc_id
         |LEFT JOIN soft sw USING (doc_id)
         |LEFT JOIN contam cm USING (doc_id)
         |ORDER BY q.doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      graft.Engine.runCorpusPipeline(s, d.filter(!isBench),
          benchmark = Some(d.filter(isBench)), dedupMaxDf = 40)
        .ledger.orderBy("doc_id")
    },

    // Approximate end-to-end dedup — the 100 TB library path: MinHash+LSH
    // candidate pairs (estimated similarity, never an exact-Jaccard pass
    // over the inverted index) → the same distributed CC → canonical
    // pick. At corpus scale the exact pipeline's inverted shingle index
    // is the bottleneck; this one touches each doc once for its
    // 16-hash signature and joins only narrow (band, bucket) rows. The
    // estimate-vs-exact disagreement margin is precisely why the
    // curation ledger keys off whichever pair set actually fed the
    // clusters (EngineSpec pins that contract).
    q("x_dedup_pipeline_minhash",
      s"""WITH RECURSIVE $minhashCteSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |   AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT c.id_a AS src, c.id_b AS dst
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b
         |  WHERE ${minhashSimSql("sa", "sb", 0.5)}),
         |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         |lbl(node, comp, i) AS (
         |  SELECT src AS node, src AS comp, 0 AS i
         |  FROM (SELECT DISTINCT src FROM sym)
         |  UNION ALL
         |  SELECT s.src AS node, min(l.comp) AS comp, l.i + 1 AS i
         |  FROM lbl l JOIN sym s ON l.node = s.dst
         |  WHERE l.i < 100
         |  GROUP BY s.src, l.i),
         |comp AS (SELECT node, min(comp) AS component FROM lbl GROUP BY node),
         |ranked AS (
         |  SELECT component, node AS canonical_doc,
         |         row_number() OVER (PARTITION BY component
         |           ORDER BY d.n_chars DESC, node) AS rn,
         |         count(*) OVER (PARTITION BY component) AS cluster_size
         |  FROM comp JOIN documents d ON d.doc_id = comp.node)
         |SELECT component, canonical_doc, cluster_size
         |FROM ranked WHERE rn = 1 ORDER BY component""") { (s, dir) =>
      // Exact-collapse composition (minHashLshPairsCollapsed): verbatim
      // copies reattach as star edges instead of O(copies²) LSH pairs —
      // connectivity-identical clusters (the oracle's uncollapsed CTE
      // proves it), near-linear on replication-heavy corpora where the
      // plain pair join went quadratic (121.7× at the 100× rehearsal).
      val pairs = TextDedup.minHashLshPairsCollapsed(docs(s, dir), "text",
        "doc_id")
      Corpus.dedupClustersFromPairs(docs(s, dir), pairs, "doc_id", "n_chars")
        .orderBy("component")
    },

    // Incremental near-dup admission: docs with doc_id % 3 == 0 arrive
    // as the delta; the rest are the already-admitted corpus, visible
    // ONLY through its signature index (TextDedup.incrementalMinHashDedup
    // never touches admitted text). The oracle recomputes both sides'
    // signatures and restricts pairing to delta×index and
    // delta×earlier-delta — the admission rule. The hot-bucket cap is
    // not mirrored: no (band, bucket) at these SFs approaches 10k rows,
    // and the cap's semantics are already oracle-checked by
    // x_minhash_lsh_capped.
    q("x_incremental_dedup",
      s"""WITH $minhashCteSql,
         |d AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
         |ix AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
         |dup_ix AS (
         |  SELECT DISTINCT c.id_a AS doc_id FROM (
         |    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |    FROM d a JOIN ix b
         |      ON a.band = b.band AND a.bucket = b.bucket) c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b
         |  WHERE ${minhashSimSql("sa", "sb", 0.5)}),
         |dup_dd AS (
         |  SELECT DISTINCT c.id_a AS doc_id FROM (
         |    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |    FROM d a JOIN d b
         |      ON a.band = b.band AND a.bucket = b.bucket
         |     AND a.doc_id > b.doc_id) c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b
         |  WHERE ${minhashSimSql("sa", "sb", 0.5)})
         |SELECT dd.doc_id,
         |       di.doc_id IS NOT NULL AS dup_of_index,
         |       dl.doc_id IS NOT NULL AS dup_of_delta,
         |       di.doc_id IS NULL AND dl.doc_id IS NULL AS keep
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) dd
         |LEFT JOIN dup_ix di USING (doc_id)
         |LEFT JOIN dup_dd dl USING (doc_id)
         |ORDER BY dd.doc_id""") { (s, dir) =>
      val all = docs(s, dir)
      val delta = all.filter(pmod(col("doc_id"), lit(3)) === 0)
      val index = TextDedup.minHashSignatures(
        all.filter(pmod(col("doc_id"), lit(3)) =!= 0), "text", "doc_id")
      val (decisions, _) = TextDedup.incrementalMinHashDedup(
        delta, index, "text", "doc_id")
      decisions.withColumnRenamed("id", "doc_id").orderBy("doc_id")
    },

    // Vocabulary heavy hitters: corpus-frequency top-k tokens. Spark plans
    // the orderBy+limit as TakeOrderedAndProject (per-partition top-k, then
    // a k-sized driver merge — no global sort), and the token count
    // partial-aggregates map-side; at 100 TB the full pass is one narrow
    // shuffle of (token, partial count).
    q("x_vocab_topk",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT unnest(toks) AS token FROM t),
         |cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
         |SELECT token, cnt,
         |       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |         AS rank
         |FROM cnt ORDER BY cnt DESC, token LIMIT 50""") { (s, dir) =>
      Corpus.vocabTopK(docs(s, dir), "text", 50)
    },

    // Per-document mean TF-IDF (lexical-quality ranking): idf quantized to
    // DECIMAL(18,6) BEFORE the per-doc sum and the sum run in DECIMAL, so
    // no float accumulation order can flip a rounded score across engines;
    // the corpus doc count N enters as a broadcast 1-row join (no driver
    // collect). Three narrow shuffles total: (id,token) counts, token df,
    // per-doc sum.
    q("x_tfidf_score",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |perdoc AS (SELECT doc_id, token, count(*) AS tc
         |           FROM tok GROUP BY doc_id, token),
         |doclen AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_toks
         |           FROM perdoc GROUP BY doc_id),
         |docfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token),
         |n AS (SELECT count(*) AS n_docs FROM doclen),
         |idf AS (SELECT token,
         |               CAST(round(ln(CAST(n_docs AS DOUBLE) / df), 6)
         |                    AS DECIMAL(18,6)) AS idf
         |        FROM docfreq, n)
         |SELECT p.doc_id, d.n_toks,
         |       round(CAST(sum(p.tc * i.idf) AS DOUBLE) / d.n_toks, 4)
         |         AS tfidf
         |FROM perdoc p
         |JOIN idf i USING (token)
         |JOIN doclen d USING (doc_id)
         |GROUP BY p.doc_id, d.n_toks
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.tfIdfScores(docs(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    },

    // BM25 per-doc scores: per-term doubles in a FIXED expression order
    // on both engines, each term rounded to 6dp then summed in DECIMAL
    // (the tfidf determinism discipline); N and avgdl enter via a
    // broadcast 1-row stats join.
    q("x_bm25_score",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |perdoc AS (SELECT doc_id, token, count(*) AS tc
         |           FROM tok GROUP BY doc_id, token),
         |doclen AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_toks
         |           FROM perdoc GROUP BY doc_id),
         |docfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token),
         |stats AS (SELECT count(*) AS n_docs,
         |                 CAST(round(avg(CAST(n_toks AS DECIMAL(18,6))), 6)
         |                      AS DOUBLE) AS avgdl
         |          FROM doclen),
         |idf AS (SELECT token,
         |               round(ln((n_docs - df + 0.5) / (df + 0.5) + 1), 6)
         |                 AS idf,
         |               avgdl
         |        FROM docfreq, stats)
         |SELECT p.doc_id, d.n_toks,
         |       CAST(round(CAST(sum(CAST(round(
         |              i.idf * (p.tc * 2.2) /
         |              (p.tc + 1.2 * (0.25 + 0.75 * d.n_toks / i.avgdl)),
         |              6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE)
         |         AS bm25
         |FROM perdoc p
         |JOIN doclen d USING (doc_id)
         |JOIN idf i USING (token)
         |GROUP BY p.doc_id, d.n_toks
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.bm25Scores(docs(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    },

    // Unigram-LM surprisal (the CCNet-style quality filter with the
    // corpus's own unigram model): surprisal quantized to DECIMAL
    // before the per-doc weighted mean — same determinism discipline
    // and shuffle shape as x_tfidf_score.
    q("x_unigram_surprisal",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |perdoc AS (SELECT doc_id, token, count(*) AS tc
         |           FROM tok GROUP BY doc_id, token),
         |doclen AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_toks
         |           FROM perdoc GROUP BY doc_id),
         |tokfreq AS (SELECT token, sum(tc) AS cnt
         |            FROM perdoc GROUP BY token),
         |tot AS (SELECT sum(cnt) AS total FROM tokfreq),
         |sp AS (SELECT token,
         |              CAST(round(ln(CAST(total AS DOUBLE) / cnt), 6)
         |                   AS DECIMAL(18,6)) AS sp
         |       FROM tokfreq, tot)
         |SELECT p.doc_id, d.n_toks,
         |       round(CAST(sum(p.tc * s.sp) AS DOUBLE) / d.n_toks, 4)
         |         AS mean_surprisal
         |FROM perdoc p
         |JOIN sp s USING (token)
         |JOIN doclen d USING (doc_id)
         |GROUP BY p.doc_id, d.n_toks
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.unigramSurprisal(docs(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    },

    // BM25 retrieval: top-20 docs for a fixed query. IDF/avgdl come
    // from the FULL corpus; only the final sum restricts to the query's
    // terms, so the scoring join touches 4 posting lists. Top-k plans
    // as TakeOrderedAndProject; ties break on doc_id.
    q("x_bm25_search",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |perdoc AS (SELECT doc_id, token, count(*) AS tc
         |           FROM tok GROUP BY doc_id, token),
         |doclen AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_toks
         |           FROM perdoc GROUP BY doc_id),
         |docfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token),
         |stats AS (SELECT count(*) AS n_docs,
         |                 CAST(round(avg(CAST(n_toks AS DECIMAL(18,6))), 6)
         |                      AS DOUBLE) AS avgdl
         |          FROM doclen),
         |idf AS (SELECT token,
         |               round(ln((n_docs - df + 0.5) / (df + 0.5) + 1), 6)
         |                 AS idf,
         |               avgdl
         |        FROM docfreq, stats)
         |SELECT p.doc_id,
         |       CAST(round(CAST(sum(CAST(round(
         |              i.idf * (p.tc * 2.2) /
         |              (p.tc + 1.2 * (0.25 + 0.75 * d.n_toks / i.avgdl)),
         |              6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE)
         |         AS score
         |FROM perdoc p
         |JOIN doclen d USING (doc_id)
         |JOIN idf i USING (token)
         |WHERE p.token IN ('spark', 'hash', 'merge', 'window')
         |GROUP BY p.doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""") { (s, dir) =>
      Corpus.bm25Search(docs(s, dir), "text", "doc_id",
        "spark hash merge window", k = 20)
    },

    // Incremental BM25 index maintenance: the corpus is admitted in two
    // batches (arrivals = doc_id % 10 = 7) whose per-doc index deltas
    // UNION into the inverted index — admitted text never re-read —
    // and the query is served from the index. The oracle is the SAME
    // full-corpus BM25 truth as x_bm25_search (different query), so
    // the hash gates that incremental admission reaches byte-identical
    // scores to a from-scratch build: df/N/avgdl recomputed at query
    // time from the narrow index, old docs re-weighted as the corpus
    // grows.
    q("x_incremental_bm25",
      s"""WITH t AS ($toksSql),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |perdoc AS (SELECT doc_id, token, count(*) AS tc
         |           FROM tok GROUP BY doc_id, token),
         |doclen AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_toks
         |           FROM perdoc GROUP BY doc_id),
         |docfreq AS (SELECT token, count(*) AS df FROM perdoc GROUP BY token),
         |stats AS (SELECT count(*) AS n_docs,
         |                 CAST(round(avg(CAST(n_toks AS DECIMAL(18,6))), 6)
         |                      AS DOUBLE) AS avgdl
         |          FROM doclen),
         |idf AS (SELECT token,
         |               round(ln((n_docs - df + 0.5) / (df + 0.5) + 1), 6)
         |                 AS idf,
         |               avgdl
         |        FROM docfreq, stats)
         |SELECT p.doc_id,
         |       CAST(round(CAST(sum(CAST(round(
         |              i.idf * (p.tc * 2.2) /
         |              (p.tc + 1.2 * (0.25 + 0.75 * d.n_toks / i.avgdl)),
         |              6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE)
         |         AS score
         |FROM perdoc p
         |JOIN doclen d USING (doc_id)
         |JOIN idf i USING (token)
         |WHERE p.token IN ('scan', 'filter', 'sort')
         |GROUP BY p.doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""") { (s, dir) =>
      val d = docs(s, dir)
      val arrivals = d.filter(pmod(col("doc_id"), lit(10)) === 7)
      val admitted = d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val (p0, l0) = Corpus.bm25IndexDelta(admitted, "text", "doc_id")
      val (p1, l1) = Corpus.bm25IndexDelta(arrivals, "text", "doc_id")
      Corpus.bm25SearchIndexed(p0.unionAll(p1), l0.unionAll(l1),
        "doc_id", "scan filter sort", k = 20)
    },

    // Chunk-level exact duplication (substring-level dedup signal): docs
    // split into consecutive 10-token chunks; a chunk recurring in ≥ 2
    // docs marks verbatim boilerplate. Distinct + df counting are narrow
    // equi-shuffles on the chunk key — never all-pairs.
    q("x_chunk_dedup",
      s"""WITH t AS ($toksSql),
         |ch AS (SELECT DISTINCT doc_id, chunk FROM (
         |  SELECT doc_id,
         |         unnest(list_transform(range(0, CAST(len(toks) // 10 AS INT)),
         |           i -> array_to_string(toks[i*10+1 : (i+1)*10], ' ')))
         |           AS chunk
         |  FROM t WHERE len(toks) >= 10)),
         |dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df
         |          FROM ch GROUP BY chunk)
         |SELECT c.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_chunks,
         |       CAST(round(CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
         |                       AS DOUBLE) / count(*), 4) AS DOUBLE)
         |         AS dup_ratio,
         |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) >= 0.5 AS flagged
         |FROM ch c JOIN dfreq f USING (chunk)
         |GROUP BY c.doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.chunkDupStats(docs(s, dir), "text", "doc_id",
          chunkTokens = 10, flagAt = 0.5, digestKeyed = false)
        .orderBy("doc_id")
    },

    // Digest-keyed library twin of x_chunk_dedup: identical semantics
    // and oracle, but every shuffle carries the 16-byte chunk digest
    // instead of raw chunk strings (Corpus.chunkDigest — collision
    // budget in its scaladoc). The SAME string-derived oracle checks
    // the digest path end-to-end: a digest collision would break the
    // hash match here, so injectivity on the corpus is gated, not
    // assumed.
    q("x_chunk_dedup_digest",
      s"""WITH t AS ($toksSql),
         |ch AS (SELECT DISTINCT doc_id, chunk FROM (
         |  SELECT doc_id,
         |         unnest(list_transform(range(0, CAST(len(toks) // 10 AS INT)),
         |           i -> array_to_string(toks[i*10+1 : (i+1)*10], ' ')))
         |           AS chunk
         |  FROM t WHERE len(toks) >= 10)),
         |dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df
         |          FROM ch GROUP BY chunk)
         |SELECT c.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_chunks,
         |       CAST(round(CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
         |                       AS DOUBLE) / count(*), 4) AS DOUBLE)
         |         AS dup_ratio,
         |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) >= 0.5 AS flagged
         |FROM ch c JOIN dfreq f USING (chunk)
         |GROUP BY c.doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.chunkDupStats(docs(s, dir), "text", "doc_id",
          chunkTokens = 10, flagAt = 0.5)
        .orderBy("doc_id")
    },

    // Cross-document boilerplate STRIP (the corpus-level complement of
    // x_chunk_dedup's flag and x_dedup_in_doc's in-doc strip): chunks
    // appearing in >= 2 documents are removed from EVERY text, tails
    // kept. Positional chunks (non-distinct) so a chunk repeated inside
    // one doc counts once per position in n_chunks; df counts distinct
    // docs. The rebuild is order-stable via the carried position.
    q("x_strip_boilerplate",
      s"""WITH t AS ($toksSql),
         |b AS (SELECT doc_id, toks,
         |             CAST(len(toks) // 10 AS INT) AS nfull
         |      FROM t),
         |ch AS (SELECT doc_id, i AS pos,
         |              array_to_string(toks[i*10+1 : (i+1)*10], ' ')
         |                AS chunk
         |       FROM b, LATERAL unnest(range(0, nfull)) AS u(i)),
         |dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df
         |          FROM ch GROUP BY chunk),
         |agg AS (SELECT doc_id,
         |               CAST(count(*) AS BIGINT) AS n_chunks,
         |               CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
         |                 AS BIGINT) AS n_stripped,
         |               string_agg(CASE WHEN f.df < 2 THEN chunk END,
         |                          ' ' ORDER BY pos) AS kept
         |        FROM ch JOIN dfreq f USING (chunk)
         |        GROUP BY doc_id),
         |tl AS (SELECT doc_id,
         |              -- array_to_string([]) is NULL in DuckDB, '' here
         |              coalesce(array_to_string(
         |                toks[nfull*10+1 : len(toks)], ' '), '') AS tail
         |       FROM b)
         |SELECT b.doc_id,
         |       coalesce(a.n_chunks, 0) AS n_chunks,
         |       coalesce(a.n_stripped, 0) AS n_stripped,
         |       CASE WHEN a.kept IS NULL OR a.kept = '' THEN tl.tail
         |            WHEN tl.tail = '' THEN a.kept
         |            ELSE a.kept || ' ' || tl.tail END AS text_clean
         |FROM b LEFT JOIN agg a USING (doc_id)
         |JOIN tl USING (doc_id)
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.stripCorpusBoilerplate(docs(s, dir), "text", "doc_id",
          chunkTokens = 10, dfThreshold = 2, digestKeyed = false)
        .orderBy("doc_id")
    },

    // Digest-keyed library twin of x_strip_boilerplate: same output,
    // same string-derived oracle, but chunk text never shuffles — the
    // df table keys on the 16-byte digest, only STRIPPED positions
    // regroup per doc, and the text rebuilds map-side from each doc's
    // own tokens by skipping dropped positions. A digest collision
    // would over-strip a chunk and fail this row's hash match, so
    // injectivity is gated end-to-end.
    q("x_strip_boilerplate_digest",
      s"""WITH t AS ($toksSql),
         |b AS (SELECT doc_id, toks,
         |             CAST(len(toks) // 10 AS INT) AS nfull
         |      FROM t),
         |ch AS (SELECT doc_id, i AS pos,
         |              array_to_string(toks[i*10+1 : (i+1)*10], ' ')
         |                AS chunk
         |       FROM b, LATERAL unnest(range(0, nfull)) AS u(i)),
         |dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df
         |          FROM ch GROUP BY chunk),
         |agg AS (SELECT doc_id,
         |               CAST(count(*) AS BIGINT) AS n_chunks,
         |               CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
         |                 AS BIGINT) AS n_stripped,
         |               string_agg(CASE WHEN f.df < 2 THEN chunk END,
         |                          ' ' ORDER BY pos) AS kept
         |        FROM ch JOIN dfreq f USING (chunk)
         |        GROUP BY doc_id),
         |tl AS (SELECT doc_id,
         |              coalesce(array_to_string(
         |                toks[nfull*10+1 : len(toks)], ' '), '') AS tail
         |       FROM b)
         |SELECT b.doc_id,
         |       coalesce(a.n_chunks, 0) AS n_chunks,
         |       coalesce(a.n_stripped, 0) AS n_stripped,
         |       CASE WHEN a.kept IS NULL OR a.kept = '' THEN tl.tail
         |            WHEN tl.tail = '' THEN a.kept
         |            ELSE a.kept || ' ' || tl.tail END AS text_clean
         |FROM b LEFT JOIN agg a USING (doc_id)
         |JOIN tl USING (doc_id)
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.stripCorpusBoilerplate(docs(s, dir), "text", "doc_id",
          chunkTokens = 10, dfThreshold = 2)
        .orderBy("doc_id")
    },

    // CCNet-style LM quality score (Wenzek et al. 2020): add-one
    // bigram LM trained on the bench exemplar slice, every raw doc
    // scored by average negative log-likelihood — the perplexity
    // filtering step, deterministic (per-bigram nll rounds 6dp,
    // DECIMAL per-doc sums, 4dp average; natural log agrees across
    // engines after the rounding, the dsir discipline).
    q("x_lm_perplexity",
      s"""WITH t AS ($toksSql),
         |ref AS (SELECT toks FROM t
         |        WHERE doc_id % 97 = 0 AND doc_id < 5000
         |          AND len(toks) >= 2),
         |rb AS (SELECT toks[i] AS w1, toks[i+1] AS w2
         |       FROM ref, LATERAL unnest(range(1, len(toks))) AS u(i)),
         |bc AS (SELECT w1, w2, count(*) AS cb FROM rb GROUP BY w1, w2),
         |uc AS (SELECT w1, count(*) AS cu FROM rb GROUP BY w1),
         |v AS (SELECT count(DISTINCT w) AS v FROM
         |        (SELECT w1 AS w FROM rb
         |         UNION ALL SELECT w2 AS w FROM rb)),
         |raw AS (SELECT doc_id, toks FROM t
         |        WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)
         |          AND len(toks) >= 2),
         |db AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |       FROM raw, LATERAL unnest(range(1, len(toks))) AS u(i)),
         |nll AS (SELECT doc_id,
         |        CAST(round(-ln((coalesce(bc.cb, 0) + 1) /
         |          CAST(coalesce(uc.cu, 0) + v.v AS DOUBLE)), 6)
         |          AS DECIMAL(18,6)) AS nll
         |        FROM db LEFT JOIN bc USING (w1, w2)
         |        LEFT JOIN uc USING (w1) CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(round(CAST(sum(nll) AS DOUBLE) / count(*), 4)
         |            AS DOUBLE) AS avg_nll
         |FROM nll GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      Corpus.lmAvgNll(
          raw = d.filter(!isBench), reference = d.filter(isBench),
          "text", "doc_id")
        .orderBy("doc_id")
    },

    // Trigram upgrade of the CCNet LM score (round-15 stretch): same
    // DECIMAL discipline, one more broadcast table (both count tables
    // stay bounded by the exemplar slice's token count).
    q("x_lm_perplexity3",
      s"""WITH t AS ($toksSql),
         |ref AS (SELECT toks FROM t
         |        WHERE doc_id % 97 = 0 AND doc_id < 5000
         |          AND len(toks) >= 3),
         |rb AS (SELECT toks[i-1] AS w1, toks[i] AS w2, toks[i+1] AS w3
         |       FROM ref, LATERAL unnest(range(2, len(toks))) AS u(i)),
         |bc AS (SELECT w1, w2, w3, count(*) AS cb FROM rb
         |       GROUP BY w1, w2, w3),
         |uc AS (SELECT w1, w2, count(*) AS cu FROM rb GROUP BY w1, w2),
         |v AS (SELECT count(DISTINCT w) AS v FROM
         |        (SELECT w1 AS w FROM rb
         |         UNION ALL SELECT w2 AS w FROM rb
         |         UNION ALL SELECT w3 AS w FROM rb)),
         |raw AS (SELECT doc_id, toks FROM t
         |        WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)
         |          AND len(toks) >= 3),
         |db AS (SELECT doc_id, toks[i-1] AS w1, toks[i] AS w2,
         |              toks[i+1] AS w3
         |       FROM raw, LATERAL unnest(range(2, len(toks))) AS u(i)),
         |nll AS (SELECT doc_id,
         |        CAST(round(-ln((coalesce(bc.cb, 0) + 1) /
         |          CAST(coalesce(uc.cu, 0) + v.v AS DOUBLE)), 6)
         |          AS DECIMAL(18,6)) AS nll
         |        FROM db LEFT JOIN bc USING (w1, w2, w3)
         |        LEFT JOIN uc USING (w1, w2) CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |       CAST(round(CAST(sum(nll) AS DOUBLE) / count(*), 4)
         |            AS DOUBLE) AS avg_nll
         |FROM nll GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      Corpus.lmAvgNll(
          raw = d.filter(!isBench), reference = d.filter(isBench),
          "text", "doc_id", order = 3)
        .orderBy("doc_id")
    },

    // Cross-document SUBSTRING dedup (Lee et al. 2022 exact-substring
    // dedup, alignment-free): stride-1 12-token rolling windows,
    // digest-keyed df counting, per-doc merged duplicated spans. The
    // oracle recomputes from raw window STRINGS with a gaps-and-islands
    // interval merge, so digest injectivity and the engine's fold-based
    // merge are both gated by the hash compare.
    q("x_substring_dedup",
      s"""WITH t AS ($toksSql),
         |b AS (SELECT doc_id, toks, len(toks) AS n FROM t
         |      WHERE len(toks) >= 12),
         |w AS (SELECT doc_id, i AS pos,
         |        array_to_string(toks[i+1 : i+12], ' ') AS win
         |      FROM b, LATERAL unnest(range(0, n - 11)) AS u(i)),
         |hot AS (SELECT win FROM w GROUP BY win
         |        HAVING count(DISTINCT doc_id) >= 2),
         |dup AS (SELECT w.doc_id, w.pos FROM w JOIN hot USING (win)),
         |lagd AS (SELECT doc_id, pos,
         |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |           AS prev
         |         FROM dup),
         |isl AS (SELECT doc_id, pos,
         |         sum(CASE WHEN prev IS NULL OR pos > prev + 12
         |                  THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |        FROM lagd),
         |spans AS (SELECT doc_id, island, min(pos) AS s,
         |                 max(pos) + 12 AS e
         |          FROM isl GROUP BY doc_id, island),
         |agg AS (SELECT doc_id,
         |          CAST(count(*) AS BIGINT) AS n_spans,
         |          CAST(sum(e - s) AS BIGINT) AS dup_tokens,
         |          string_agg(CAST(s AS VARCHAR) || '-' ||
         |                     CAST(e AS VARCHAR), ';' ORDER BY s)
         |            AS spans
         |        FROM spans GROUP BY doc_id),
         |dcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT)
         |           AS n_dup_windows
         |         FROM dup GROUP BY doc_id)
         |SELECT b.doc_id,
         |       CAST(b.n - 11 AS BIGINT) AS n_windows,
         |       coalesce(d.n_dup_windows, 0) AS n_dup_windows,
         |       coalesce(a.n_spans, 0) AS n_spans,
         |       coalesce(a.dup_tokens, 0) AS dup_tokens,
         |       coalesce(a.spans, '') AS spans
         |FROM b LEFT JOIN dcnt d USING (doc_id)
         |LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""") { (s, dir) =>
      Corpus.substringDupSpans(docs(s, dir), "text", "doc_id",
          windowTokens = 12)
        .orderBy("doc_id")
    },

    // Cross-document exact-substring STRIP (the consuming step of
    // x_substring_dedup): every duplicated window cluster keeps its
    // lowest-(doc, pos) canonical occurrence; other occurrences merge
    // into per-doc removal spans and the text rebuilds without them.
    // The oracle recomputes from raw window STRINGS (row_number over
    // (doc, pos) per window = the canonical pick) and rebuilds kept
    // tokens positionally — digest injectivity, the fold merge AND the
    // rebuild all gated by the hash compare.
    q("x_substring_strip",
      """WITH t AS (SELECT doc_id, text,
        |        list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                    x -> x <> '') AS toks
        |      FROM documents),
        |b AS (SELECT doc_id, text, toks, len(toks) AS n FROM t),
        |w AS (SELECT doc_id, i AS pos,
        |        array_to_string(toks[i+1 : i+12], ' ') AS win
        |      FROM b, LATERAL unnest(range(0, n - 11)) AS u(i)
        |      WHERE n >= 12),
        |hot AS (SELECT win FROM w GROUP BY win
        |        HAVING count(DISTINCT doc_id) >= 2),
        |ranked AS (SELECT w.doc_id, w.pos,
        |             row_number() OVER (PARTITION BY w.win
        |               ORDER BY w.doc_id, w.pos) AS rn
        |           FROM w JOIN hot USING (win)),
        |dup AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
        |lagd AS (SELECT doc_id, pos,
        |           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |             AS prev
        |         FROM dup),
        |isl AS (SELECT doc_id, pos,
        |          sum(CASE WHEN prev IS NULL OR pos > prev + 12
        |                   THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM lagd),
        |spans AS (SELECT doc_id, island, min(pos) AS s,
        |                 max(pos) + 12 AS e
        |          FROM isl GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |          CAST(sum(e - s) AS BIGINT) AS stripped_tokens
        |        FROM spans GROUP BY doc_id),
        |toki AS (SELECT b.doc_id, u.i, b.toks[u.i + 1] AS tok
        |         FROM b JOIN agg USING (doc_id),
        |              LATERAL unnest(range(0, b.n)) AS u(i)),
        |kept AS (SELECT tk.doc_id,
        |           array_to_string(list(tk.tok ORDER BY tk.i), ' ')
        |             AS txt
        |         FROM toki tk
        |         WHERE NOT EXISTS (SELECT 1 FROM spans s
        |           WHERE s.doc_id = tk.doc_id
        |             AND tk.i >= s.s AND tk.i < s.e)
        |         GROUP BY tk.doc_id)
        |SELECT b.doc_id,
        |       CAST(b.n AS BIGINT) AS n_tokens,
        |       coalesce(a.n_spans, 0) AS n_spans,
        |       coalesce(a.stripped_tokens, 0) AS stripped_tokens,
        |       CASE WHEN a.doc_id IS NOT NULL THEN coalesce(k.txt, '')
        |            ELSE b.text END AS text
        |FROM b LEFT JOIN agg a USING (doc_id)
        |       LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.stripSubstringDups(docs(s, dir), "text", "doc_id",
          windowTokens = 12)
        .orderBy("doc_id")
    },

    // Incremental substring-dedup admission (the x_incremental_dedup
    // pattern on the Lee et al. substring family): arrivals
    // (doc_id % 10 = 7) strip against the admitted corpus's persisted
    // window-digest index — never its text — plus intra-batch
    // keep-lowest-(doc, pos). The oracle recomputes BOTH sides from raw
    // window STRINGS (admitted index = distinct admitted windows), so
    // cross-boundary digest injectivity, the three-way window
    // classification (fresh / index-dup / intra-dup counters), the
    // span merge AND the rebuild are all hash-gated.
    q("x_incremental_substring",
      """WITH t AS (SELECT doc_id, text,
        |        list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                    x -> x <> '') AS toks
        |      FROM documents),
        |b AS (SELECT doc_id, text, toks, len(toks) AS n FROM t),
        |w AS (SELECT doc_id, i AS pos,
        |        array_to_string(toks[i+1 : i+12], ' ') AS win
        |      FROM b, LATERAL unnest(range(0, n - 11)) AS u(i)
        |      WHERE n >= 12),
        |ix AS (SELECT DISTINCT win FROM w WHERE doc_id % 10 <> 7),
        |aw AS (SELECT doc_id, pos, win FROM w WHERE doc_id % 10 = 7),
        |dupix AS (SELECT a.doc_id, a.pos FROM aw a
        |          WHERE EXISTS (SELECT 1 FROM ix WHERE ix.win = a.win)),
        |fresh AS (SELECT a.doc_id, a.pos, a.win FROM aw a
        |          WHERE NOT EXISTS
        |            (SELECT 1 FROM ix WHERE ix.win = a.win)),
        |hotf AS (SELECT win FROM fresh GROUP BY win
        |         HAVING count(DISTINCT doc_id) >= 2),
        |rankedf AS (SELECT f.doc_id, f.pos,
        |              row_number() OVER (PARTITION BY f.win
        |                ORDER BY f.doc_id, f.pos) AS rn
        |            FROM fresh f JOIN hotf USING (win)),
        |dupintra AS (SELECT doc_id, pos FROM rankedf WHERE rn > 1),
        |dup AS (SELECT doc_id, pos FROM dupix
        |        UNION ALL SELECT doc_id, pos FROM dupintra),
        |lagd AS (SELECT doc_id, pos,
        |           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |             AS prev
        |         FROM dup),
        |isl AS (SELECT doc_id, pos,
        |          sum(CASE WHEN prev IS NULL OR pos > prev + 12
        |                   THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM lagd),
        |spans AS (SELECT doc_id, island, min(pos) AS s,
        |                 max(pos) + 12 AS e
        |          FROM isl GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |          CAST(sum(e - s) AS BIGINT) AS stripped_tokens
        |        FROM spans GROUP BY doc_id),
        |fcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fresh
        |         FROM fresh GROUP BY doc_id),
        |icnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ixdup
        |         FROM dupix GROUP BY doc_id),
        |ncnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_intradup
        |         FROM dupintra GROUP BY doc_id),
        |ab AS (SELECT doc_id, text, toks, n FROM b
        |       WHERE doc_id % 10 = 7),
        |toki AS (SELECT ab.doc_id, u.i, ab.toks[u.i + 1] AS tok
        |         FROM ab JOIN agg USING (doc_id),
        |              LATERAL unnest(range(0, ab.n)) AS u(i)),
        |kept AS (SELECT tk.doc_id,
        |           array_to_string(list(tk.tok ORDER BY tk.i), ' ')
        |             AS txt
        |         FROM toki tk
        |         WHERE NOT EXISTS (SELECT 1 FROM spans s
        |           WHERE s.doc_id = tk.doc_id
        |             AND tk.i >= s.s AND tk.i < s.e)
        |         GROUP BY tk.doc_id)
        |SELECT ab.doc_id,
        |       CAST(ab.n AS BIGINT) AS n_tokens,
        |       CAST(greatest(ab.n - 11, 0) AS BIGINT) AS n_windows,
        |       coalesce(f.n_fresh, 0) AS n_fresh_windows,
        |       coalesce(i.n_ixdup, 0) AS n_index_dup_windows,
        |       coalesce(nc.n_intradup, 0) AS n_intra_dup_windows,
        |       coalesce(a.n_spans, 0) AS n_spans,
        |       coalesce(a.stripped_tokens, 0) AS stripped_tokens,
        |       CASE WHEN a.doc_id IS NOT NULL THEN coalesce(k.txt, '')
        |            ELSE ab.text END AS text
        |FROM ab LEFT JOIN agg a USING (doc_id)
        |       LEFT JOIN fcnt f USING (doc_id)
        |       LEFT JOIN icnt i USING (doc_id)
        |       LEFT JOIN ncnt nc USING (doc_id)
        |       LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val arrivals = d.filter(pmod(col("doc_id"), lit(10)) === 7)
      val admitted = d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val index = Corpus.substringDigestIndex(admitted, "text", "doc_id",
        windowTokens = 12).localCheckpoint()
      Corpus.incrementalSubstringStrip(arrivals, index, "text", "doc_id",
          windowTokens = 12)._1
        .orderBy("doc_id")
    },

    // Contiguous sequence packing: each doc lands in the fixed-budget
    // training sequence its starting token offset falls into, per source
    // stream. Pure integer arithmetic (exact cross-engine); the only
    // shuffle is the per-source running sum, and sources are numerous and
    // bounded so no window serializes the corpus.
    q("x_pack_sequences",
      s"""WITH t AS ($toksSql),
         |n AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks
         |      FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, source, n_toks,
         |             sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
         |               ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM n)
         |SELECT doc_id, source, n_toks,
         |       source || '#' ||
         |         CAST((cum - n_toks) // 256 AS VARCHAR) AS seq_id
         |FROM c ORDER BY doc_id""") { (s, dir) =>
      Corpus.packSequences(docs(s, dir), "text", "doc_id", "source",
          tokenBudget = 256)
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split: 16-bit md5 prefix of the id
    // buckets every row — reproducible across engines/runs/cluster sizes,
    // stable under corpus growth, map-only (scan-bound at 100 TB).
    q("x_split_assign",
      """SELECT doc_id,
        |       CASE WHEN h < 52429 THEN 'train'
        |            WHEN h < 58982 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |                  AS BIGINT) AS h
        |      FROM documents)
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.splitAssign(docs(s, dir), "doc_id")
        .select("doc_id", "split")
        .orderBy("doc_id")
    },

    // Random-hyperplane (sign) LSH near-neighbor pairs over embeddings —
    // the corpus×corpus candidate generator (Similarity.signLshPairs):
    // 32 sign bits over integer-quantized vectors, 4 bands of 8 bits
    // (4-bit chunks stop being selective beyond toy corpora: expected
    // bucket size is N/2^width, so width must track log2(N)), candidates
    // = equi-join on (band, chunk), exact-cosine verify at 0.3. The
    // bucket cap (10000) cannot bind at bench SFs (a bucket is at most
    // the corpus, 2000 rows) so the oracle omits that no-op filter; the
    // cap semantics are spec-pinned in SimilarityLibSpec.
    //
    // SCALE LABEL: at a FIXED band width the candidate count grows as
    // N²/2^width — the 10× rehearsal shows ~16× for exactly that
    // reason. This bench form pins the fixed-width arithmetic against
    // the oracle; the production path widens chunks with log2(N) (the
    // signature has 32 bits to draw on) and keeps the hot-bucket cap,
    // which bounds any bucket's pair contribution regardless of N.
    q("x_embed_lsh",
      s"""WITH s AS (
         |  SELECT vec_id, embedding, $sigSql AS sig FROM embeddings),
         |b AS (
         |  SELECT vec_id, embedding, band, (sig >> (band * 8)) & 255 AS chunk
         |  FROM s CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM b x JOIN b y
         |    ON x.band = y.band AND x.chunk = y.chunk
         |   AND x.vec_id < y.vec_id)
         |SELECT c.vec_a, c.vec_b,
         |       round($dotSql / (${normSql("a")} * ${normSql("b")}), 6)
         |         AS cos_sim
         |FROM cand c
         |JOIN embeddings a ON a.vec_id = c.vec_a
         |JOIN embeddings b ON b.vec_id = c.vec_b
         |WHERE $dotSql / (${normSql("a")} * ${normSql("b")}) >= 0.3
         |ORDER BY vec_a, vec_b""") { (s, dir) =>
      Similarity.signLshPairs(Tables(s, dir, "embeddings"),
          "vec_id", "embedding")
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          col("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },

    // The PRODUCTION sign-LSH form — log2(N)-widened chunks
    // (Similarity.signLshWidthFor: width ≈ log2(N/8), clamped [8, 12])
    // plus a hot-bucket cap that the oracle mirrors: candidate volume is
    // O(N · targetBucket) by construction instead of the fixed-width
    // N²/2^width the x_embed_lsh bench form pins. The corpus count is a
    // plan-time statistic (one cheap count, AQE-style); the oracle
    // derives the SAME width from count(*) so both engines agree at
    // every SF — 8-bit chunks at sf0.01 (N=500), 8 at sf0.1 (N=2000),
    // 12 at the 10× rehearsal (N=20000).
    q("x_embed_lsh_wide",
      s"""WITH w AS (
         |  SELECT GREATEST(8, LEAST(12,
         |           CAST(ceil(log2(count(*) / 8.0)) AS INT))) AS wd
         |  FROM embeddings),
         |s AS (
         |  SELECT vec_id, embedding, ${sigSqlBits(48)} AS sig
         |  FROM embeddings),
         |b AS (
         |  SELECT vec_id, band,
         |         (sig >> (band * wd)) & ((CAST(1 AS BIGINT) << wd) - 1)
         |           AS chunk
         |  FROM s CROSS JOIN w
         |  CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
         |capped AS (
         |  SELECT vec_id, band, chunk FROM (
         |    SELECT b.*, count(*) OVER (PARTITION BY band, chunk) AS bn
         |    FROM b) WHERE bn <= 32),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM capped x JOIN capped y
         |    ON x.band = y.band AND x.chunk = y.chunk
         |   AND x.vec_id < y.vec_id)
         |SELECT c.vec_a, c.vec_b,
         |       round($dotSql / (${normSql("a")} * ${normSql("b")}), 6)
         |         AS cos_sim
         |FROM cand c
         |JOIN embeddings a ON a.vec_id = c.vec_a
         |JOIN embeddings b ON b.vec_id = c.vec_b
         |WHERE $dotSql / (${normSql("a")} * ${normSql("b")}) >= 0.3
         |ORDER BY vec_a, vec_b""") { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val width = Similarity.signLshWidthFor(emb.count())
      Similarity.signLshPairs(emb, "vec_id", "embedding",
          bits = 4 * width, bands = 4, maxBucketSize = 32)
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          col("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },

    // PII redaction over a synthetic contact-text corpus from `customer`:
    // email / IPv4 / phone spans → typed tags + per-doc counts, through
    // the map-only library scrub (patterns restricted to Java-regex ∩ RE2
    // so both engines agree byte for byte). Rows vary which PII kinds
    // they carry (mod 3/4/5) so zero-count paths are exercised too.
    q("x_redact_pii",
      s"""WITH src AS (
         |  SELECT c_custkey AS doc_id,
         |    'reach ' ||
         |    CASE WHEN c_custkey % 3 = 0 THEN 'the list'
         |         ELSE regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g')
         |              || '@corp.example' END ||
         |    CASE WHEN c_custkey % 4 = 0 THEN ''
         |         ELSE ' at 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.'
         |              || CAST(c_custkey % 250 AS VARCHAR) || '.'
         |              || CAST(c_custkey % 240 AS VARCHAR) END ||
         |    CASE WHEN c_custkey % 5 = 0 THEN ''
         |         ELSE ' phone 555-' ||
         |              lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') END
         |    || ' segment ' || lower(c_mktsegment) AS text
         |  FROM customer)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Corpus.EmailRe}'))
         |       AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${Corpus.Ipv4Re}'))
         |       AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${Corpus.PhoneRe}'))
         |       AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Corpus.EmailRe}', '<EMAIL>', 'g'),
         |    '${Corpus.Ipv4Re}', '<IP>', 'g'),
         |    '${Corpus.PhoneRe}', '<PHONE>', 'g') AS redacted
         |FROM src ORDER BY doc_id""") { (s, dir) =>
      val c = col("c_custkey")
      val src = Tables(s, dir, "customer").select(
        c.as("doc_id"),
        concat(
          lit("reach "),
          when(pmod(c, lit(3)) === 0, lit("the list"))
            .otherwise(concat(
              regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
              lit("@corp.example"))),
          when(pmod(c, lit(4)) === 0, lit(""))
            .otherwise(concat(lit(" at 10."), pmod(c, lit(200)), lit("."),
              pmod(c, lit(250)), lit("."), pmod(c, lit(240)))),
          when(pmod(c, lit(5)) === 0, lit(""))
            .otherwise(concat(lit(" phone 555-"),
              lpad(pmod(c, lit(10000)).cast("string"), 4, "0"))),
          lit(" segment "), lower(col("c_mktsegment"))).as("text"))
      Corpus.redactPii(src, "text", "doc_id").orderBy("doc_id")
    },

    // Source-mixture sampling (training-mixture weights): src0 kept at
    // 20%, src1 at 60%, everything else in full — decided by a
    // deterministic md5 bucket (digest chars 5-8; chars 1-4 belong to
    // x_split_assign so mixing and splitting stay independent).
    q("x_source_mix",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4)
        |              AS BIGINT) AS h
        |  FROM documents)
        |WHERE h < CASE source WHEN 'src0' THEN 13107
        |                      WHEN 'src1' THEN 39322
        |                      ELSE 65536 END
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.sourceMix(docs(s, dir), "source", "doc_id",
          Seq("src0" -> 0.2, "src1" -> 0.6))
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // DSIR data selection (Xie et al. 2023): rank raw docs by hashed-
    // token importance toward the TARGET distribution (the benchmark
    // subset doubles as the quality-exemplar target, reusing
    // x_contamination's constant-size bench definition). Bucket
    // log-ratios round to 6dp and per-doc sums run in DECIMAL (the
    // tfidf discipline); the 256-row weight table broadcasts, the raw
    // corpus streams through one count + one scoring aggregation, and
    // the final top-100 is TakeOrderedAndProject.
    q("x_dsir_select",
      s"""WITH t AS ($toksSql),
         |tb AS (SELECT doc_id,
         |              (doc_id % 97 = 0 AND doc_id < 5000) AS bench,
         |              (CAST('0x' || substr(md5(w), 1, 4) AS BIGINT) % 256)
         |                AS bucket
         |       FROM (SELECT doc_id, unnest(toks) AS w FROM t)),
         |ctb AS (SELECT bucket, count(*) AS ct FROM tb WHERE bench
         |        GROUP BY bucket),
         |crb AS (SELECT bucket, count(*) AS cr FROM tb WHERE NOT bench
         |        GROUP BY bucket),
         |cb AS (SELECT COALESCE(ctb.bucket, crb.bucket) AS bucket,
         |              COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
         |       FROM ctb FULL JOIN crb ON ctb.bucket = crb.bucket),
         |tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cb),
         |wt AS (SELECT bucket,
         |              CAST(round(ln(((ct + 1.0) / (nt + 256.0)) /
         |                            ((cr + 1.0) / (nr + 256.0))), 6)
         |                   AS DECIMAL(18,6)) AS lw
         |       FROM cb, tot),
         |sc AS (SELECT tb.doc_id, count(*) AS n_toks,
         |              CAST(round(CAST(sum(w.lw) AS DOUBLE), 4) AS DOUBLE)
         |                AS dsir_logw
         |       FROM tb JOIN wt w USING (bucket)
         |       WHERE NOT tb.bench GROUP BY tb.doc_id)
         |SELECT doc_id, n_toks, dsir_logw,
         |       CAST(row_number() OVER (ORDER BY dsir_logw DESC, doc_id)
         |            AS BIGINT) AS rank
         |FROM sc ORDER BY dsir_logw DESC, doc_id LIMIT 100""") { (s, dir) =>
      val d = docs(s, dir)
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      val scored = Corpus.dsirLogWeights(
        raw = d.filter(!isBench), target = d.filter(isBench),
        "text", "doc_id", buckets = 256)
      val top = scored
        .orderBy(col("dsir_logw").desc, col("doc_id")).limit(100)
      // rank over ≤ 100 rows: bounded single-partition window
      val w = Window.orderBy(col("dsir_logw").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w).cast("long"))
    },

    // Temperature-flattened language mixture (α = 0.5): the corpus's
    // language distribution is head-heavy (en ≈ 3× fr at every SF), so
    // each language keeps rate sqrt(n_min/n_lang) — the smallest
    // language survives whole, the head is downsampled toward uniform.
    // No normalizing sum (engine-unstable float accumulation); the rate
    // is one exact division + sqrt per bounded group, broadcast back,
    // then a map-only md5-bucket filter on digest chars 9-12 (independent of both split assignment and source mixing).
    q("x_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS ng FROM documents GROUP BY lang),
        |m AS (SELECT min(ng) AS nmin FROM c),
        |r AS (SELECT lang,
        |             CAST(round(sqrt(CAST(nmin AS DOUBLE) / ng) * 65536)
        |                  AS BIGINT) AS bound
        |      FROM c, m)
        |SELECT d.doc_id, d.lang, r.bound FROM documents d
        |JOIN r USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4)
        |           AS BIGINT) < r.bound
        |ORDER BY doc_id""") { (s, dir) =>
      Corpus.temperatureMix(docs(s, dir), "lang", "doc_id")
        .select("doc_id", "lang", "bound")
        .orderBy("doc_id")
    },

    // Token-budget curation: fill each source's 600-token quota with
    // its best (longest) documents; the running sum starts inside the
    // budget so each group overshoots by at most one doc.
    q("x_budget_select",
      """SELECT doc_id, source, n_toks, cum_toks FROM (
        |  SELECT doc_id, source, n_toks,
        |         CAST(sum(n_toks) OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
        |  FROM (SELECT doc_id, source, n_chars,
        |               CAST(len(list_filter(
        |                 regexp_split_to_array(trim(text), '\s+'),
        |                 x -> x <> '')) AS BIGINT) AS n_toks
        |        FROM documents))
        |WHERE cum_toks - n_toks < 600
        |ORDER BY source, doc_id""") { (s, dir) =>
      Corpus.selectToBudget(docs(s, dir), "text", "doc_id",
          "source", "n_chars", 600L)
        .orderBy("source", "doc_id")
    },

    // In-document repeated-chunk removal (C4-style boilerplate strip,
    // the within-doc complement of x_chunk_dedup). Every 4th doc gets
    // its text doubled so the strip genuinely fires (the word-soup
    // corpus has almost no natural in-doc repeats): a doubled doc's
    // second half dedups away chunk for chunk.
    q("x_dedup_in_doc",
      """WITH src AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0 THEN text || ' ' || text
        |              ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id,
        |             list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                         x -> x <> '') AS toks
        |      FROM src),
        |c AS (SELECT doc_id, toks,
        |             CAST(floor(len(toks) / 5) AS INT) AS n_full FROM t),
        |ch AS (SELECT doc_id, toks, n_full,
        |       list_transform(range(0, n_full),
        |         i -> array_to_string(toks[i*5+1:i*5+5], ' ')) AS chunks
        |       FROM c),
        |k AS (SELECT doc_id, toks, n_full, chunks,
        |      list_transform(list_filter(range(1, len(chunks) + 1),
        |        i -> list_position(chunks, chunks[i]) = i),
        |        i -> chunks[i]) AS kept
        |      FROM ch)
        |SELECT doc_id,
        |  CAST(len(chunks) AS BIGINT) AS n_chunks,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  trim(coalesce(array_to_string(kept, ' '), '') || ' ' ||
        |       coalesce(array_to_string(toks[n_full*5+1:len(toks)], ' '),
        |                '')) AS cleaned
        |FROM k ORDER BY doc_id""") { (s, dir) =>
      val src = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      Corpus.dedupChunksInDoc(src, "text", "doc_id", 5)
        .orderBy("doc_id")
    },
  )
}
