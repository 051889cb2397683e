package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{QueryEntry, QueryModule, Tables}

/** Oracle gate for the trained quality classifier
  * ([[Corpus.trainQualityClassifier]] / [[Corpus.scoreQuality]]) — the
  * GPT-3-style trained quality filter completing the quality stack
  * beside the rule set (x_quality_*), LM scoring (x_lm_perplexity) and
  * importance weighting (x_dsir_select).
  *
  * The DuckDB oracle recomputes the ENTIRE training trajectory from
  * scratch — both full-batch hard-sigmoid gradient steps unrolled as
  * CTE pairs (g{t} → w{t+1}), every intermediate in exact decimal —
  * then scores the non-exemplar corpus with the step-2 weights. A
  * single bit of divergence anywhere in training (feature hashing,
  * pseudo-negative pick, clamp, rounding) shifts some weight and fails
  * the per-doc score hash. iters=2 is the smallest count that gates
  * the weight FEEDBACK (step 2's gradient depends on step 1's
  * weights), the x_ivf_train "one round is what SQL expresses
  * non-recursively" reasoning extended one level by unrolling.
  */
object QualityClassifierQueries extends QueryModule {

  private val Dims = 64
  private val NegCut = 6554 // ≈ 10% of the 16-bit md5 window
  private val Lr = "0.000001"

  /** `lab`-relative feature CTE body (uni+bigram hashed buckets). */
  private def featsSql(src: String): String =
    s"""SELECT doc_id, CAST('0x' || substr(md5(t), 1, 13) AS BIGINT)
       |         % $Dims AS b
       |  FROM (SELECT doc_id,
       |               list_concat(toks,
       |                 list_transform(range(1, greatest(len(toks), 1)),
       |                   i -> toks[i] || ' ' || toks[i + 1])) AS fts
       |        FROM $src) l, unnest(l.fts) AS u(t)""".stripMargin

  /** One unrolled gradient step over `lab`/`feats` (relation names
    * parameterized so the incremental oracle can feed each step a
    * DIFFERENT arrival batch): r{t} from w{t}'s scores, g{t} summed
    * per bucket (+ bias row j = dims), w{t+1} = round(w - lr·g, 12). */
  private def stepSql(t: Int, lab: String = "lab",
      feats: String = "feats"): String = {
    val (zp, z, r, g, wPrev, wNext) =
      (s"zp$t", s"z$t", s"r$t", s"g$t", s"w${t - 1}", s"w$t")
    s"""$zp AS (SELECT f.doc_id, CAST(sum(w.w) AS DECIMAL(20,12)) AS zp
       |        FROM $feats f JOIN $wPrev w ON w.j = f.b
       |        GROUP BY f.doc_id),
       |$z AS (SELECT l.doc_id, l.y,
       |              CAST(coalesce(z.zp, 0) +
       |                   (SELECT w FROM $wPrev WHERE j = $Dims)
       |                   AS DECIMAL(20,12)) AS z
       |       FROM $lab l LEFT JOIN $zp z USING (doc_id)),
       |$r AS (SELECT doc_id,
       |              CAST(least(greatest(0.5 + 0.25 * z, 0), 1) - y
       |                   AS DECIMAL(25,14)) AS r
       |       FROM $z),
       |$g AS (SELECT f.b AS j, sum(r.r) AS g
       |       FROM $feats f JOIN $r r USING (doc_id) GROUP BY f.b
       |       UNION ALL SELECT $Dims, sum(r) FROM $r),
       |$wNext AS (SELECT w.j,
       |             CAST(round(w.w - $Lr *
       |               coalesce(CAST(g.g AS DECIMAL(24,14)), 0), 12)
       |               AS DECIMAL(20,12)) AS w
       |           FROM $wPrev w LEFT JOIN $g g USING (j))""".stripMargin
  }

  /** The labeled-slice CTE body (exemplar positives + fixed md5-window
    * pseudo-negatives), shared by both oracles. */
  private val labSql: String =
    s"""SELECT doc_id,
       |         coalesce(list_filter(
       |           regexp_split_to_array(trim(text), '\\s+'),
       |           x -> x <> ''), []) AS toks,
       |         CASE WHEN doc_id % 97 = 0 AND doc_id < 5000
       |              THEN 1 ELSE 0 END AS y
       |  FROM documents
       |  WHERE (doc_id % 97 = 0 AND doc_id < 5000)
       |     OR CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4)
       |             AS BIGINT) < $NegCut""".stripMargin

  /** Scoring tail over the non-exemplar corpus with `wFinal`'s weights
    * — shared by both oracles. */
  private def scoreSql(wFinal: String): String =
    s"""corp AS (SELECT doc_id,
       |                coalesce(list_filter(
       |                  regexp_split_to_array(trim(text), '\\s+'),
       |                  x -> x <> ''), []) AS toks
       |         FROM documents
       |         WHERE NOT (doc_id % 97 = 0 AND doc_id < 5000)),
       |cfeat AS (${featsSql("corp")}),
       |czp AS (SELECT f.doc_id, CAST(sum(w.w) AS DECIMAL(20,12)) AS zp
       |        FROM cfeat f JOIN $wFinal w ON w.j = f.b
       |        GROUP BY f.doc_id),
       |sc AS (SELECT c.doc_id,
       |              round(CAST(least(greatest(0.5 + 0.25 *
       |                CAST(coalesce(z.zp, 0) +
       |                     (SELECT w FROM $wFinal WHERE j = $Dims)
       |                     AS DECIMAL(20,12)), 0), 1) AS DOUBLE), 6)
       |                AS score
       |       FROM corp c LEFT JOIN czp z USING (doc_id))
       |SELECT doc_id, score, score >= 0.5 AS quality_pass
       |FROM sc ORDER BY doc_id""".stripMargin

  private val w0Sql: String =
    s"""w0 AS (SELECT unnest(range(0, ${Dims + 1})) AS j,
       |              CAST(0 AS DECIMAL(20,12)) AS w)""".stripMargin

  private def classifierOracleSql: String =
    s"""WITH lab AS ($labSql),
       |feats AS (${featsSql("lab")}),
       |$w0Sql,
       |${stepSql(1)},
       |${stepSql(2)},
       |${scoreSql("w2")}""".stripMargin

  /** Incremental oracle: the SAME step algebra, but step t's gradient
    * runs over arrival batch t-1's labeled slice only (batch =
    * doc_id % 3) — the weight trajectory the incremental trainer walks
    * when each micro-batch contributes one step. */
  private def incrementalOracleSql: String = {
    val batches = (0 until 3).map { b =>
      s"""lab$b AS (SELECT doc_id, toks, y FROM lab
         |          WHERE doc_id % 3 = $b),
         |feats$b AS (${featsSql(s"lab$b")})""".stripMargin
    }.mkString(",\n")
    s"""WITH lab AS ($labSql),
       |$batches,
       |$w0Sql,
       |${stepSql(1, "lab0", "feats0")},
       |${stepSql(2, "lab1", "feats1")},
       |${stepSql(3, "lab2", "feats2")},
       |${scoreSql("w3")}""".stripMargin
  }

  override val entries: Seq[QueryEntry] = Seq(
    q("x_quality_classifier", classifierOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val isEx = pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      val w = Corpus.trainQualityClassifier(d, "text", "doc_id", isEx,
        dims = Dims, iters = 2, negCut = NegCut,
        lr = new java.math.BigDecimal(Lr))
      // FanOut the corpus before map-only scoring: the per-ngram md5 +
      // decimal fold is the heavy part, and the single-row-group scan
      // otherwise runs it on one core (no-op at scale — the guard; the
      // operator itself stays shuffle-free by contract)
      Corpus.scoreQuality(
          graft.core.FanOut(d.filter(!isEx).select("doc_id", "text")),
          "text", "doc_id", w, dims = Dims)
        .orderBy("doc_id")
    },

    // The incremental twin (the admission-sink pattern on TRAINING):
    // each arrival batch contributes ONE full-batch gradient step over
    // its own labeled slice, the dims+1 weight vector carrying across
    // batches as bounded SNAPSHOT state. The oracle recomputes the
    // sequential 3-step trajectory with per-batch feature relations —
    // order-sensitive by design (data order = arrival order), like
    // every incremental form here.
    q("x_incremental_quality_classifier", incrementalOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val isEx = pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000
      var w: Option[Array[java.math.BigDecimal]] = None
      (0 until 3).foreach { b =>
        val batch = d.filter(pmod(col("doc_id"), lit(3)) === b)
        w = Some(Corpus.trainQualityClassifier(batch, "text", "doc_id",
          isEx, dims = Dims, iters = 1, negCut = NegCut,
          lr = new java.math.BigDecimal(Lr), init = w))
      }
      // FanOut before map-only scoring — same reasoning as the batch row
      Corpus.scoreQuality(
          graft.core.FanOut(d.filter(!isEx).select("doc_id", "text")),
          "text", "doc_id", w.get, dims = Dims)
        .orderBy("doc_id")
    })
}
