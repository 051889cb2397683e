package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryEntry, QueryModule, Tables}

/** End-to-end oracle gate for the STREAMING curation sink
  * ([[graft.streaming.DocumentStreaming.curationSink]]) — the
  * x_curation_ledger treatment applied ACROSS the micro-batch boundary.
  *
  * The query drives the real sink closure (the exact `foreachBatch`
  * function a stream would run) over a deterministic 3-batch arrival
  * split of the corpus (batch = doc_id % 3, batches in order), then
  * reads back EVERYTHING the sink persisted: the ledger (one row per
  * batch doc, every drop reason), the admitted corpus (gated by sha256
  * of the post-strip text), and both index states (per-doc signature
  * membership + cardinalities). The DuckDB oracle recomputes the whole
  * composition from scratch — three sequential batch expansions of the
  * proven component oracles (x_incremental_dedup's banded MinHash
  * admission, x_incremental_substring's window classification with the
  * keep-lowest rule, x_incremental_contamination's vocab screen), each
  * batch's indexes derived from the PREVIOUS batches' admitted output
  * — so the sink's composition rules (quality gating of the dedup/strip
  * feed, admitted-only index growth, `stripped_empty` interplay,
  * batch-keyed state visibility) are all hash-gated end-to-end.
  *
  * Columns gated per doc: passes, dup_of_index, dup_of_delta, keep,
  * stripped_tokens, contamination, contaminated, stripped_empty,
  * admitted, batch_id, admitted_sha (sha256 of the admitted text, ''
  * when not admitted), in_sig_index (signature-index membership ==
  * admitted — the admitted-only index rule), plus the two constant
  * state cardinalities n_sig_index (== count of admitted docs; a
  * replay-duplicated or never-admitted signature would break it) and
  * n_sub_index (== distinct admitted post-strip windows).
  */
object CurationSinkQueries extends QueryModule {

  /** The ONE curation parameter set. Both Scala glue sites — the
    * x_curation_sink entry below and TrainingPipelineQueries' composed
    * chain — pass exactly these to
    * [[graft.streaming.DocumentStreaming.curationSink]], and the oracle
    * CTEs interpolate the ones not already pinned by shared SQL helpers
    * (numHashes/bands are the 16×4 arithmetic inside
    * CorpusQueries.minhashSigBandsSql that every MinHash oracle shares;
    * ngramN/shingleN are spelled in the `raw`/vocab CTEs beside it).
    * Change a value here and every consumer moves together instead of
    * silently diverging until the hash gate fails at run time. */
  private[operators] object CurationParams {
    val ngramN = 2        // dedup shingle width (the `raw` CTE's 2-gram)
    val numHashes = 16    // MinHash signature width (minhashSigBandsSql)
    val bands = 4         // LSH band count (minhashSigBandsSql)
    val threshold = 0.5   // MinHash similarity admission threshold
    val windowTokens = 12 // substring-strip window grain
    val shingleN = 3      // contamination vocab shingle width
    val flagAt = 0.8      // contamination flag rate
  }

  // window tokens (the x_incremental_substring grain)
  private val L = CurationParams.windowTokens

  /** Per-batch CTE block of the oracle: batch `b`'s quality-passing
    * delta run through MinHash admission vs the admitted-so-far
    * signature ids, substring strip vs the admitted-so-far window set,
    * and the contamination screen — emitting adm{b} (admitted ids) and
    * awin{b} (admitted post-strip windows) for the NEXT batch's
    * indexes. */
  private def batchCte(b: Int): String = {
    val sigIx =
      if (b == 0) "SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE"
      else (0 until b).map(i => s"SELECT doc_id FROM adm$i")
        .mkString(" UNION ALL ")
    val subIx =
      if (b == 0) "SELECT CAST(NULL AS VARCHAR) AS win WHERE FALSE"
      else (0 until b).map(i => s"SELECT win FROM awin$i")
        .mkString(" UNION ")
    s"""pass$b AS MATERIALIZED (
       |  SELECT tt.doc_id FROM t tt JOIN qual q USING (doc_id)
       |  WHERE tt.batch = $b AND q.passes),
       |sigix$b AS MATERIALIZED ($sigIx),
       |subix$b AS MATERIALIZED ($subIx),
       |mdi$b AS MATERIALIZED (
       |  SELECT DISTINCT c.id_a AS doc_id FROM (
       |    SELECT DISTINCT a.doc_id AS id_a, i.doc_id AS id_b
       |    FROM bands a JOIN pass$b USING (doc_id)
       |    JOIN bands i ON a.band = i.band AND a.bucket = i.bucket
       |    JOIN sigix$b six ON six.doc_id = i.doc_id) c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b
       |  WHERE ${CorpusQueries.minhashSimSql("sa", "sb", CurationParams.threshold)}),
       |mdd$b AS MATERIALIZED (
       |  SELECT DISTINCT c.id_a AS doc_id FROM (
       |    SELECT DISTINCT a.doc_id AS id_a, d2.doc_id AS id_b
       |    FROM bands a JOIN pass$b USING (doc_id)
       |    JOIN bands d2 ON a.band = d2.band AND a.bucket = d2.bucket
       |      AND a.doc_id > d2.doc_id
       |    JOIN pass$b p2 ON p2.doc_id = d2.doc_id) c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b
       |  WHERE ${CorpusQueries.minhashSimSql("sa", "sb", CurationParams.threshold)}),
       |keep$b AS MATERIALIZED (
       |  SELECT p.doc_id FROM pass$b p
       |  WHERE NOT EXISTS (SELECT 1 FROM mdi$b x WHERE x.doc_id = p.doc_id)
       |    AND NOT EXISTS (SELECT 1 FROM mdd$b x WHERE x.doc_id = p.doc_id)),
       |win$b AS MATERIALIZED (
       |  SELECT tt.doc_id, u.i AS pos,
       |         array_to_string(tt.toks[u.i+1 : u.i+$L], ' ') AS win
       |  FROM t tt JOIN keep$b USING (doc_id),
       |       LATERAL unnest(range(0, len(tt.toks) - ${L - 1})) AS u(i)
       |  WHERE len(tt.toks) >= $L),
       |sdi$b AS MATERIALIZED (
       |  SELECT w.doc_id, w.pos FROM win$b w
       |  WHERE EXISTS (SELECT 1 FROM subix$b s WHERE s.win = w.win)),
       |sfresh$b AS MATERIALIZED (
       |  SELECT w.doc_id, w.pos, w.win FROM win$b w
       |  WHERE NOT EXISTS (SELECT 1 FROM subix$b s WHERE s.win = w.win)),
       |shot$b AS MATERIALIZED (SELECT win FROM sfresh$b GROUP BY win
       |           HAVING count(DISTINCT doc_id) >= 2),
       |srank$b AS MATERIALIZED (
       |  SELECT f.doc_id, f.pos,
       |         row_number() OVER (PARTITION BY f.win
       |           ORDER BY f.doc_id, f.pos) AS rn
       |  FROM sfresh$b f JOIN shot$b USING (win)),
       |sdup$b AS MATERIALIZED (SELECT doc_id, pos FROM sdi$b
       |           UNION ALL SELECT doc_id, pos FROM srank$b WHERE rn > 1),
       |slag$b AS MATERIALIZED (SELECT doc_id, pos,
       |             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |           FROM sdup$b),
       |sisl$b AS MATERIALIZED (SELECT doc_id, pos,
       |             sum(CASE WHEN prev IS NULL OR pos > prev + $L
       |                      THEN 1 ELSE 0 END)
       |               OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |           FROM slag$b),
       |sspans$b AS MATERIALIZED (SELECT doc_id, island, min(pos) AS s,
       |                    max(pos) + $L AS e
       |             FROM sisl$b GROUP BY doc_id, island),
       |sagg$b AS MATERIALIZED (SELECT doc_id, CAST(sum(e - s) AS BIGINT)
       |             AS stripped_tokens
       |           FROM sspans$b GROUP BY doc_id),
       |stoki$b AS MATERIALIZED (
       |  SELECT sd.doc_id, u.i, tt.toks[u.i + 1] AS tok
       |  FROM (SELECT DISTINCT doc_id FROM sspans$b) sd
       |  JOIN t tt USING (doc_id),
       |       LATERAL unnest(range(0, len(tt.toks))) AS u(i)),
       |skept$b AS MATERIALIZED (
       |  SELECT tk.doc_id, list(tk.tok ORDER BY tk.i) AS kt
       |  FROM stoki$b tk
       |  WHERE NOT EXISTS (SELECT 1 FROM sspans$b s
       |    WHERE s.doc_id = tk.doc_id AND tk.i >= s.s AND tk.i < s.e)
       |  GROUP BY tk.doc_id),
       |fin$b AS MATERIALIZED (
       |  SELECT k.doc_id,
       |         CASE WHEN sp.doc_id IS NOT NULL
       |              THEN coalesce(sk.kt, []) ELSE tt.toks END AS ftoks,
       |         CASE WHEN sp.doc_id IS NOT NULL
       |              THEN coalesce(array_to_string(sk.kt, ' '), '')
       |              ELSE tt.text END AS ftext,
       |         coalesce(sa.stripped_tokens, 0) AS stripped_tokens
       |  FROM keep$b k
       |  JOIN t tt USING (doc_id)
       |  LEFT JOIN (SELECT DISTINCT doc_id FROM sspans$b) sp
       |    ON sp.doc_id = k.doc_id
       |  LEFT JOIN skept$b sk ON sk.doc_id = k.doc_id
       |  LEFT JOIN sagg$b sa ON sa.doc_id = k.doc_id),
       |csh$b AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(1, len(ftoks) - 1),
       |             i -> ftoks[i] || ' ' || ftoks[i+1] || ' ' || ftoks[i+2])))
       |           AS shingle
       |  FROM fin$b WHERE len(ftoks) >= 3),
       |ctot$b AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM csh$b
       |           GROUP BY doc_id),
       |chit$b AS MATERIALIZED (SELECT c.doc_id, count(*) AS n_hit
       |           FROM csh$b c JOIN vocab USING (shingle)
       |           GROUP BY c.doc_id),
       |cont$b AS MATERIALIZED (SELECT h.doc_id,
       |             CAST(round(CAST(h.n_hit AS DOUBLE) / ct.n_sh, 4)
       |                  AS DOUBLE) AS rate,
       |             CAST(h.n_hit AS DOUBLE) / ct.n_sh >= ${CurationParams.flagAt}
       |               AS contaminated
       |           FROM chit$b h JOIN ctot$b ct USING (doc_id)),
       |adm$b AS MATERIALIZED (
       |  SELECT f.doc_id FROM fin$b f
       |  LEFT JOIN cont$b c ON c.doc_id = f.doc_id
       |  WHERE NOT coalesce(c.contaminated, FALSE) AND len(f.ftoks) > 0),
       |awin$b AS MATERIALIZED (
       |  SELECT DISTINCT array_to_string(f.ftoks[u.i+1 : u.i+$L], ' ')
       |           AS win
       |  FROM fin$b f JOIN adm$b USING (doc_id),
       |       LATERAL unnest(range(0, len(f.ftoks) - ${L - 1})) AS u(i)
       |  WHERE len(f.ftoks) >= $L)""".stripMargin
  }

  /** The composition's shared WITH-body (no `WITH` keyword): the corpus/
    * quality/vocab/signature prelude, the three sequential batch
    * expansions, and the cross-batch unions (`finall` = per-doc post-
    * strip tokens/text of every dedup-kept doc, `contall`,
    * `subixfinal`). x_curation_sink's oracle selects the ledger off it;
    * x_training_pipeline extends it with the pack/materialize fold over
    * the ADMITTED docs. */
  private[operators] def curationCtesSql: String = {
    val batches = (0 until 3).map(batchCte).mkString(",\n")
    s"""corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)),
       |t AS MATERIALIZED (SELECT doc_id, text,
       |        list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                    x -> x <> '') AS toks,
       |        doc_id % 3 AS batch
       |      FROM corpus),
       |qual AS MATERIALIZED (SELECT doc_id,
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
       |vocab AS MATERIALIZED (
       |  SELECT DISTINCT unnest(list_distinct(
       |           list_transform(range(1, len(stoks) - 1),
       |             i -> stoks[i] || ' ' || stoks[i+1] || ' ' || stoks[i+2])))
       |           AS shingle
       |  FROM (SELECT list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |               x -> x <> '') AS stoks
       |        FROM documents WHERE doc_id % 97 = 0 AND doc_id < 5000)
       |  WHERE len(stoks) >= 3),
       |raw AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(1, len(toks)),
       |                          i -> toks[i] || ' ' || toks[i+1]))) AS shingle
       |  FROM t WHERE len(toks) >= 2),
       |${CorpusQueries.minhashSigBandsSql},
       |$batches,
       |finall AS MATERIALIZED (SELECT * FROM fin0 UNION ALL
       |           SELECT * FROM fin1 UNION ALL SELECT * FROM fin2),
       |contall AS MATERIALIZED (SELECT * FROM cont0 UNION ALL
       |            SELECT * FROM cont1 UNION ALL SELECT * FROM cont2),
       |subixfinal AS MATERIALIZED (SELECT win FROM awin0 UNION
       |               SELECT win FROM awin1 UNION SELECT win FROM awin2)""".stripMargin
  }

  private def sinkOracleSql: String = {
    val unionAll = (p: String) => (0 until 3)
      .map(b => s"SELECT doc_id FROM $p$b").mkString(" UNION ALL ")
    s"""WITH $curationCtesSql
       |SELECT tt.doc_id, q.passes,
       |  (mdi.doc_id IS NOT NULL) AS dup_of_index,
       |  (mdd.doc_id IS NOT NULL) AS dup_of_delta,
       |  (kp.doc_id IS NOT NULL) AS keep,
       |  coalesce(f.stripped_tokens, 0) AS stripped_tokens,
       |  coalesce(c.rate, 0.0) AS contamination,
       |  coalesce(c.contaminated, FALSE) AS contaminated,
       |  coalesce(len(f.ftoks) = 0, FALSE) AS stripped_empty,
       |  (ad.doc_id IS NOT NULL) AS admitted,
       |  tt.batch AS batch_id,
       |  CASE WHEN ad.doc_id IS NOT NULL THEN sha256(f.ftext)
       |       ELSE '' END AS admitted_sha,
       |  (ad.doc_id IS NOT NULL) AS in_sig_index,
       |  (SELECT count(*) FROM subixfinal) AS n_sub_index,
       |  (SELECT count(*) FROM (${unionAll("adm")})) AS n_sig_index
       |FROM t tt
       |JOIN qual q USING (doc_id)
       |LEFT JOIN (SELECT DISTINCT doc_id FROM (${unionAll("mdi")})) mdi
       |  USING (doc_id)
       |LEFT JOIN (SELECT DISTINCT doc_id FROM (${unionAll("mdd")})) mdd
       |  USING (doc_id)
       |LEFT JOIN (${unionAll("keep")}) kp USING (doc_id)
       |LEFT JOIN finall f USING (doc_id)
       |LEFT JOIN contall c USING (doc_id)
       |LEFT JOIN (${unionAll("adm")}) ad USING (doc_id)
       |ORDER BY tt.doc_id""".stripMargin
  }

  /** Recursive-delete lives in one place: [[graft.core.Scratch]]. */
  private[operators] def deleteRec(root: String): Unit =
    graft.core.Scratch.deleteRec(root)

  override val entries: Seq[QueryEntry] = Seq(
    q("x_curation_sink", sinkOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val isBench =
        pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      val corpus = d.filter(!isBench).select("doc_id", "text")
      // a FRESH state root per invocation: the sink's writes are
      // deterministic in content, the directory is just scratch — it
      // is deleted below once the result is checkpointed off it
      val root = java.nio.file.Files
        .createTempDirectory("graft_curation_sink").toString
      try {
        graft.streaming.DocumentStreaming.registerSuite(s, s"$root/vocab",
          d.filter(isBench), "text", "doc_id", n = 3)
        val P = CurationParams
        val sink = graft.streaming.DocumentStreaming.curationSink(root,
          "text", "doc_id", n = P.ngramN, numHashes = P.numHashes,
          bands = P.bands, threshold = P.threshold,
          windowTokens = P.windowTokens, shingleN = P.shingleN,
          flagAt = P.flagAt)
        (0 until 3).foreach { b =>
          sink(corpus.filter(pmod(col("doc_id"), lit(3)) === b), b.toLong)
        }
        val ledger = s.read.parquet(s"$root/ledger")
        val admitted = s.read.parquet(s"$root/admitted")
        val sigIx = s.read.parquet(s"$root/minhash_index")
        // bounded driver-side state cardinalities (counts, not collects)
        val nSub = s.read.parquet(s"$root/substring_index").count()
        val nSig = sigIx.count()
        ledger
          .join(admitted.select(col("doc_id"),
            sha2(col("text"), 256).as("_sha")), Seq("doc_id"), "left")
          .join(sigIx.select(col("id").as("doc_id"))
            .withColumn("_insig", lit(true)), Seq("doc_id"), "left")
          .select(col("doc_id"), col("passes"), col("dup_of_index"),
            col("dup_of_delta"), col("keep"), col("stripped_tokens"),
            col("contamination"), col("contaminated"),
            col("stripped_empty"), col("admitted"),
            col("batch_id").cast("long").as("batch_id"),
            coalesce(col("_sha"), lit("")).as("admitted_sha"),
            coalesce(col("_insig"), lit(false)).as("in_sig_index"),
            lit(nSub).as("n_sub_index"), lit(nSig).as("n_sig_index"))
          .orderBy("doc_id")
          .localCheckpoint()
      } finally deleteRec(root)
    })
}
