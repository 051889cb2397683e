package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication over `documents`: exact, n-gram Jaccard via
  * inverted index, MinHash+LSH banding, SimHash.
  *
  * Scale design (the 100 TB path):
  *  - NO all-pairs comparison anywhere. Exact dedup is a hash groupBy;
  *    Jaccard candidates come from an inverted shingle index (join on
  *    shingle, bounded per-bucket); MinHash candidates come from LSH band
  *    buckets. Both candidate joins are equi-joins Catalyst can shuffle
  *    on the bucket key, with AQE skew-split on hot shingles.
  *  - Hash family: one md5 per shingle truncated to a 52-bit bigint and
  *    reduced into the 31-bit field, then k affine permutations mod
  *    2^31−1 ([[TextDedup.minHashPerm]]) — both
  *    engines compute it bit-for-bit, and the scan-side hot loop pays ONE
  *    digest per shingle instead of k.
  */
object TextDedupQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Distinct word-2-shingle set per doc (set semantics for Jaccard).
    * Fanned out first: the md5 signature/index passes downstream must not
    * serialize on a single scan split (see [[graft.core.FanOut]]). */
  private def shingles(d: DataFrame): DataFrame =
    graft.core.FanOut(d)
      .withColumn("toks", filter(split(trim(col("text")), " "), x => x =!= ""))
      .filter(size(col("toks")) >= 2)
      .withColumn("shingle", explode_outer(expr(
        "array_distinct(transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1])))")))
      .select("doc_id", "lang", "source", "shingle")

  private val shinglesSql =
    """SELECT doc_id, lang, source, unnest(list_distinct(
      |         list_transform(range(1, len(toks)),
      |                        i -> toks[i] || ' ' || toks[i+1]))) AS shingle
      |FROM (SELECT doc_id, lang, source,
      |             list_filter(string_split(trim(text), ' '), x -> x <> '')
      |               AS toks
      |      FROM documents) WHERE len(toks) >= 2""".stripMargin

  override val entries: Seq[QueryEntry] = Seq(
    // Exact dedup: hash-groupBy on normalized content, keep min id, emit
    // group size (distinct from d1 which emits the survivor rows)
    q("x_dedup_exact",
      """SELECT sha256(lower(trim(text))) AS content_id,
        |       min(doc_id) AS keeper, count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY content_id""") { (s, dir) =>
      docs(s, dir)
        .groupBy(sha2(lower(trim(col("text"))), 256).as("content_id"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_dupes"))
        .orderBy("content_id")
    },

    // n-gram Jaccard near-dup, EXACT (uncapped), within (lang, source)
    // buckets: jaccard = |∩| / (|A|+|B|-|∩|) ≥ 0.5. Since round 12 the
    // engine side runs the prefix-filtered set-similarity join — the
    // de-naived exact path (10× rehearsal 14.1× → 6.5×; the synthetic
    // 31-word vocabulary is prefix filtering's worst case, real Zipfian
    // corpora prune far harder). The capped twin remains the
    // bounded-cost screening path for corpora with stop-shingles.
    q("x_ngram_jaccard",
      s"""WITH sh AS ($shinglesSql),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.lang = b.lang
         |   AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |       CAST(round(CAST(p.shared AS DECIMAL(18,6)) /
         |            (sa.n + sb.n - p.shared), 4) AS DOUBLE) AS jaccard
         |FROM pairs p
         |JOIN sizes sa ON sa.doc_id = p.doc_a
         |JOIN sizes sb ON sb.doc_id = p.doc_b
         |WHERE CAST(p.shared AS DECIMAL(18,6)) / (sa.n + sb.n - p.shared) >= 0.5
         |ORDER BY doc_a, doc_b""") { (s, dir) =>
      // Exact result through the prefix-filtered set-similarity join
      // (TextDedup.ngramJaccardPairsPrefix — All-Pairs/PPJoin): the
      // oracle keeps the naive Σ df² formulation, the engine runs the
      // rarest-first prefix index + size prune + array-intersect verify
      // and must produce the identical pair list.
      val sh = shingles(docs(s, dir))
      val pairs = TextDedup.ngramJaccardPairsPrefix(sh, "doc_id",
        "shingle", Seq("lang", "source"), threshold = 0.5)
      val jac = col("shared").cast("decimal(18,6)") /
        (col("na") + col("nb") - col("shared"))
      pairs
        .filter(jac >= 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(jac, 4).cast("double").as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // MinHash + LSH: 8 affine min-hashes off one 52-bit md5 base, 4 bands
    // × 2 rows; candidate pairs share a band bucket within (lang, source);
    // emitted with the signature-estimated similarity (matching fraction
    // of the 8 hashes)
    q("x_minhash_lsh",
      s"""WITH sh AS ($shinglesSql),
         |sig AS (
         |  SELECT doc_id, lang, source,
         |         ${(0 until 8).map(i =>
              s"min((${TextDedup.minHashA(i)} * base + " +
                s"${TextDedup.minHashB(i)}) % ${TextDedup.MinHashP}) AS h$i")
              .mkString(", ")}
         |  FROM (SELECT doc_id, lang, source,
         |               CAST('0x' || substr(md5(shingle), 1, 13) AS BIGINT)
         |                 % ${TextDedup.MinHashP} AS base
         |        FROM sh)
         |  GROUP BY doc_id, lang, source),
         |bands AS (
         |  SELECT doc_id, lang, source, band, bucket FROM (
         |    SELECT doc_id, lang, source,
         |           unnest([0, 1, 2, 3]) AS band,
         |           unnest([${(0 until 4).map(b =>
              s"CAST(h${2 * b} AS VARCHAR) || '|' || " +
                s"CAST(h${2 * b + 1} AS VARCHAR)").mkString(", ")}]) AS bucket
         |    FROM sig)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |   AND a.lang = b.lang AND a.source = b.source
         |   AND a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |       CAST((${(0 until 8).map(i =>
              s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")})
         |            AS DOUBLE) / 8 AS est_sim
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.doc_a
         |JOIN sig sb ON sb.doc_id = c.doc_b
         |ORDER BY doc_a, doc_b""") { (s, dir) =>
      val sh = shingles(docs(s, dir))
        .withColumn("_base", TextDedup.shingleBase(col("shingle")))
      val hashCols: Seq[Column] = (0 until 8).map(i =>
        min(TextDedup.minHashPerm(col("_base"), i)).as(s"h$i"))
      val sig = sh.groupBy("doc_id", "lang", "source")
        .agg(hashCols.head, hashCols.tail: _*).localCheckpoint()
      // carry the signature THROUGH the band self-join: candidates and
      // their match score come out of one join instead of candidate-join
      // + two signature re-joins
      val bands = sig.select(
        (Seq(col("doc_id"), col("lang"), col("source")) ++
          (0 until 8).map(i => col(s"h$i")) :+
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              concat_ws("|", col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
                .as("bucket"))): _*)).as("bb")): _*)
        .select(col("doc_id"), col("lang"), col("source"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"),
          struct((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
      val a = bands.select(col("doc_id").as("doc_a"), col("lang"),
        col("source"), col("band"), col("bucket"), col("sig").as("sig_a"))
      val b = bands.select(col("doc_id").as("doc_b"),
        col("lang").as("lang_b"), col("source").as("source_b"),
        col("band").as("band_b"), col("bucket").as("bucket_b"),
        col("sig").as("sig_b"))
      val matches = (0 until 8).map(i =>
        when(col("sig_a").getField(s"h$i") === col("sig_b").getField(s"h$i"),
          1).otherwise(0)).reduce(_ + _)
      a.join(b,
        col("band") === col("band_b") && col("bucket") === col("bucket_b")
          && col("lang") === col("lang_b")
          && col("source") === col("source_b")
          && col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(first(matches).as("m"))
        .select(col("doc_a"), col("doc_b"),
          (col("m").cast("double") / 8).as("est_sim"))
        .orderBy("doc_a", "doc_b")
    },

    // SimHash (16-bit demo width; the md5-hex formulation is replicated in
    // the oracle bit-for-bit; production width is parameterized in Scala)
    q("x_simhash",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '),
        |                        x -> x <> '')) AS tok
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |         sum(CASE WHEN
        |           ((strpos('0123456789abcdef',
        |                    substr(md5(tok), 1 + b.bit // 4, 1)) - 1)
        |            // CASE b.bit % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
        |                            WHEN 2 THEN 2 ELSE 1 END) % 2 = 1
        |           THEN 1 ELSE -1 END) AS s
        |  FROM tok, (SELECT unnest(range(0, 16)) AS bit) b
        |  GROUP BY doc_id, b.bit)
        |SELECT doc_id,
        |       CAST(sum(CASE WHEN s > 0
        |                THEN (CAST(1 AS BIGINT) << CAST(15 - bit AS INTEGER))
        |                ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      val tok = graft.core.FanOut(docs(s, dir))
        .select(col("doc_id"),
          explode(filter(split(trim(col("text")), " "), x => x =!= ""))
            .as("tok"))
      val bitsDim = (0 until 16).map(b => lit(b))
      val withBit = tok.select(col("doc_id"), col("tok"),
        explode(array(bitsDim: _*)).as("bit"))
      // hex digit (bit/4) of md5(tok), tested at weight 8/4/2/1
      val hexDigit = instr(lit("0123456789abcdef"),
        substring(md5(col("tok")), (col("bit") / 4).cast("int") + 1, lit(1))) - 1
      val mask = when(pmod(col("bit"), lit(4)) === 0, 8)
        .when(pmod(col("bit"), lit(4)) === 1, 4)
        .when(pmod(col("bit"), lit(4)) === 2, 2).otherwise(1)
      val contrib = when(pmod((hexDigit / mask).cast("int"), lit(2)) === 1, 1)
        .otherwise(-1)
      withBit
        .groupBy("doc_id", "bit")
        .agg(sum(contrib).as("s"))
        .groupBy("doc_id")
        .agg(sum(when(col("s") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(15 - bit AS INT))"))
          .otherwise(0L)).as("simhash"))
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs via the library's banded-Hamming join
    // (TextDedup.simHashPairs): 16-bit sigs, 4 bands of 4 bits, pairs
    // verified with exact popcount ≤ 2. Pigeonhole: hamming ≤ 2 over 4
    // disjoint chunks forces agreement on ≥ 1 chunk, so the equi-join on
    // (band, chunk) loses nothing. Runs on a deterministic 10% doc subset
    // so 4-bit banding stays selective at bench SFs. Oracle tokenizes on
    // \s+ exactly like the library.
    q("x_simhash_pairs",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |           regexp_split_to_array(trim(text), '\s+'),
        |           x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |         sum(CASE WHEN
        |           ((strpos('0123456789abcdef',
        |                    substr(md5(tok), 1 + b.bit // 4, 1)) - 1)
        |            // CASE b.bit % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
        |                            WHEN 2 THEN 2 ELSE 1 END) % 2 = 1
        |           THEN 1 ELSE -1 END) AS s
        |  FROM tok, (SELECT unnest(range(0, 16)) AS bit) b
        |  GROUP BY doc_id, b.bit),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0
        |                  THEN (CAST(1 AS BIGINT) << CAST(15 - bit AS INTEGER))
        |                  ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |         (simhash >> CAST(b.band * 4 AS INTEGER)) & 15 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
        |           AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2
        |ORDER BY id_a, id_b""") { (s, dir) =>
      TextDedup.simHashPairs(
        docs(s, dir).filter(pmod(col("doc_id"), lit(10)) === 0),
        "text", "doc_id", bits = 16, bands = 4, maxHamming = 2)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // Incremental SimHash admission (the x_incremental_dedup contract
    // on Hamming-banded signatures): within the same deterministic 10%
    // subset as x_simhash_pairs, docs with doc_id % 3 == 0 arrive as
    // the delta; the rest are the admitted corpus, visible ONLY through
    // its (id, simhash) index. The oracle recomputes both sides'
    // signatures and restricts pairing to delta×index and
    // delta×earlier-delta with the same popcount ≤ 2 verification. The
    // hot-bucket cap is not mirrored (no bucket approaches 10k rows at
    // these SFs; the cap's shape is pinned by x_simhash_pairs' twin in
    // the library code path).
    q("x_incremental_simhash",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |           regexp_split_to_array(trim(text), '\s+'),
        |           x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |         sum(CASE WHEN
        |           ((strpos('0123456789abcdef',
        |                    substr(md5(tok), 1 + b.bit // 4, 1)) - 1)
        |            // CASE b.bit % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
        |                            WHEN 2 THEN 2 ELSE 1 END) % 2 = 1
        |           THEN 1 ELSE -1 END) AS s
        |  FROM tok, (SELECT unnest(range(0, 16)) AS bit) b
        |  GROUP BY doc_id, b.bit),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0
        |                  THEN (CAST(1 AS BIGINT) << CAST(15 - bit AS INTEGER))
        |                  ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |         (simhash >> CAST(b.band * 4 AS INTEGER)) & 15 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        |d AS (SELECT * FROM banded WHERE doc_id % 3 = 0),
        |ix AS (SELECT * FROM banded WHERE doc_id % 3 <> 0),
        |dup_ix AS (
        |  SELECT DISTINCT a.doc_id FROM d a JOIN ix b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
        |dup_dd AS (
        |  SELECT DISTINCT a.doc_id FROM d a JOIN d b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |   AND a.doc_id > b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2)
        |SELECT dd.doc_id,
        |       di.doc_id IS NOT NULL AS dup_of_index,
        |       dl.doc_id IS NOT NULL AS dup_of_delta,
        |       di.doc_id IS NULL AND dl.doc_id IS NULL AS keep
        |FROM (SELECT doc_id FROM documents
        |      WHERE doc_id % 10 = 0 AND doc_id % 3 = 0) dd
        |LEFT JOIN dup_ix di USING (doc_id)
        |LEFT JOIN dup_dd dl USING (doc_id)
        |ORDER BY dd.doc_id""") { (s, dir) =>
      val sub = docs(s, dir).filter(pmod(col("doc_id"), lit(10)) === 0)
      val delta = sub.filter(pmod(col("doc_id"), lit(3)) === 0)
      val index = TextDedup.simHash(
        sub.filter(pmod(col("doc_id"), lit(3)) =!= 0), "text", "doc_id",
        bits = 16)
      val (decisions, _) = TextDedup.incrementalSimHashDedup(
        delta, index, "text", "doc_id", bits = 16, bands = 4,
        maxHamming = 2)
      decisions.withColumnRenamed("id", "doc_id").orderBy("doc_id")
    },

    // Incremental SimHash admission at the LIBRARY-DEFAULT config —
    // 64-bit signatures, 4 bands of 16 bits, maxHamming 3 (the shape
    // the scaladoc recommends and the 100 TB path runs): 65536 buckets
    // per band keep candidate density selective where the 16-bit
    // oracle config above (16 buckets/band) floods structurally. Same
    // deterministic delta/index split as the 16-bit row so the two are
    // directly comparable; the oracle builds the 64-bit signature via
    // HUGEINT bit accumulation wrapped to the signed-64 value Spark's
    // shiftleft sum produces (bit 63 set ⇒ negative — both engines
    // agree bit-for-bit), and bands slice 16-bit chunks whose
    // arithmetic-shift+mask equals Spark's shiftrightunsigned+mask.
    q("x_incremental_simhash_wide",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |           regexp_split_to_array(trim(text), '\s+'),
        |           x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT doc_id, b.bit,
        |         sum(CASE WHEN
        |           ((strpos('0123456789abcdef',
        |                    substr(md5(tok), 1 + b.bit // 4, 1)) - 1)
        |            // CASE b.bit % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
        |                            WHEN 2 THEN 2 ELSE 1 END) % 2 = 1
        |           THEN 1 ELSE -1 END) AS sgn
        |  FROM tok, (SELECT unnest(range(0, 64)) AS bit) b
        |  GROUP BY doc_id, b.bit),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(h - CASE WHEN h >= 9223372036854775808
        |                  THEN 18446744073709551616 ELSE 0 END
        |              AS BIGINT) AS simhash
        |  FROM (SELECT doc_id,
        |          sum(CASE WHEN sgn > 0
        |              THEN CAST(1 AS HUGEINT) << CAST(63 - bit AS INTEGER)
        |              ELSE CAST(0 AS HUGEINT) END) AS h
        |        FROM bits GROUP BY doc_id)),
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |         (simhash >> CAST(b.band * 16 AS INTEGER)) & 65535 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        |d AS (SELECT * FROM banded WHERE doc_id % 3 = 0),
        |ix AS (SELECT * FROM banded WHERE doc_id % 3 <> 0),
        |dup_ix AS (
        |  SELECT DISTINCT a.doc_id FROM d a JOIN ix b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        |dup_dd AS (
        |  SELECT DISTINCT a.doc_id FROM d a JOIN d b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |   AND a.doc_id > b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
        |SELECT dd.doc_id,
        |       di.doc_id IS NOT NULL AS dup_of_index,
        |       dl.doc_id IS NOT NULL AS dup_of_delta,
        |       di.doc_id IS NULL AND dl.doc_id IS NULL AS keep
        |FROM (SELECT doc_id FROM documents
        |      WHERE doc_id % 10 = 0 AND doc_id % 3 = 0) dd
        |LEFT JOIN dup_ix di USING (doc_id)
        |LEFT JOIN dup_dd dl USING (doc_id)
        |ORDER BY dd.doc_id""") { (s, dir) =>
      val sub = docs(s, dir).filter(pmod(col("doc_id"), lit(10)) === 0)
      val delta = sub.filter(pmod(col("doc_id"), lit(3)) === 0)
      val index = TextDedup.simHash(
        sub.filter(pmod(col("doc_id"), lit(3)) =!= 0), "text", "doc_id")
      val (decisions, _) = TextDedup.incrementalSimHashDedup(
        delta, index, "text", "doc_id")
      decisions.withColumnRenamed("id", "doc_id").orderBy("doc_id")
    },

    // n-gram Jaccard, CAPPED scale-safe form: the library's
    // TextDedup.ngramJaccardPairs with a shingle document-frequency cap
    // (maxDf = 40 — chosen so the corpus's hot stop-shingles actually get
    // dropped at every SF, exercising the cap path). The cap is a
    // deterministic count filter, so the oracle replicates it exactly via
    // HAVING count(*) <= 40. This is the formulation the 100 TB path
    // runs: one stop-shingle shared by k docs would otherwise emit O(k²)
    // candidate pairs. Oracle tokenizes on \s+ exactly like the library.
    q("x_ngram_jaccard_capped",
      """WITH raw AS (
        |  SELECT doc_id, unnest(list_distinct(
        |           list_transform(range(1, len(toks)),
        |                          i -> toks[i] || ' ' || toks[i+1]))) AS shingle
        |  FROM (SELECT doc_id,
        |               list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                           x -> x <> '') AS toks
        |        FROM documents) WHERE len(toks) >= 2),
        |keep AS (SELECT shingle FROM raw GROUP BY shingle
        |         HAVING count(*) <= 40),
        |sh AS (SELECT raw.doc_id, raw.shingle
        |       FROM raw JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |       CAST(round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared),
        |                  4) AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.id_a
        |JOIN sizes sb ON sb.doc_id = p.id_b
        |WHERE CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared) >= 0.5
        |ORDER BY id_a, id_b""") { (s, dir) =>
      TextDedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
          n = 2, threshold = 0.5, maxDf = 40)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).cast("double").as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // MinHash+LSH, CAPPED scale-safe form: TextDedup.minHashLshPairs with
    // the degenerate-bucket guard small enough (maxBucketSize = 2) that
    // buckets are really dropped at every SF — members still pair through
    // their other, more selective bands, which the oracle reproduces with
    // the same HAVING count(*) <= 2 filter before the band self-join.
    q("x_minhash_lsh_capped",
      s"""WITH raw AS (
         |  SELECT doc_id, unnest(list_distinct(
         |           list_transform(range(1, len(toks)),
         |                          i -> toks[i] || ' ' || toks[i+1]))) AS shingle
         |  FROM (SELECT doc_id,
         |               list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                           x -> x <> '') AS toks
         |        FROM documents) WHERE len(toks) >= 2),
         |sig AS (
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
         |  SELECT doc_id, unnest([0, 1, 2, 3]) AS band,
         |         unnest([${(0 until 4).map(b =>
              (0 until 4).map(r => s"CAST(h${4 * b + r} AS VARCHAR)")
                .mkString(" || '|' || ")).mkString(", ")}]) AS bucket
         |  FROM sig),
         |ok AS (SELECT band, bucket FROM bands GROUP BY 1, 2
         |       HAVING count(*) <= 2),
         |capped AS (SELECT bands.* FROM bands JOIN ok USING (band, bucket)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |   AND a.doc_id < b.doc_id)
         |SELECT c.id_a, c.id_b,
         |       CAST((${(0 until 16).map(i =>
              s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")})
         |            AS DOUBLE) / 16 AS est_similarity
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.id_a
         |JOIN sig sb ON sb.doc_id = c.id_b
         |WHERE (${(0 until 16).map(i =>
              s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")})
         |      >= 8
         |ORDER BY id_a, id_b""") { (s, dir) =>
      TextDedup.minHashLshPairs(docs(s, dir), "text", "doc_id",
          n = 2, numHashes = 16, bands = 4, threshold = 0.5,
          maxBucketSize = 2)
        .orderBy("id_a", "id_b")
    },
  )
}
