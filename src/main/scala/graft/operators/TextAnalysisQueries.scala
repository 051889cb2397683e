package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text analysis over the `documents` table: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All four are single-pass narrow transforms (no shuffle except the final
  * presentation sort): at 100 TB each is a map-only stage over the parquet
  * scan, whole-stage-codegen'd (no UDFs in the hot path).
  */
object TextAnalysisQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language-ID (deterministic, replicated in the oracle). */
  private val langProfiles = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "les", "des"))

  override val entries: Seq[QueryEntry] = Seq(
    // Per-source quantile profile of the length metric — the oracle runs
    // the EXACT percentile twin (both engines interpolate R-7); the
    // library default is the GK-sketch approx_percentile (bounded
    // per-group state, mergeable map-side), drift-bounded against this
    // exact form in QualityQuantilesSpec.
    q("x_quality_quantiles",
      """SELECT source, count(*) AS n_docs,
        |       CAST(round(quantile_cont(n_chars, 0.5), 4) AS DOUBLE) AS p50,
        |       CAST(round(quantile_cont(n_chars, 0.9), 4) AS DOUBLE) AS p90,
        |       CAST(round(quantile_cont(n_chars, 0.99), 4) AS DOUBLE) AS p99
        |FROM documents GROUP BY source ORDER BY source""") { (s, dir) =>
      Corpus.qualityQuantiles(t(s, dir, "documents"), "n_chars", "source",
          Seq(0.5, 0.9, 0.99), exact = true)
        .orderBy("source")
    },

    // Per-source vocabulary cardinality — the diversity gauge. The
    // oracle runs the EXACT twin (count distinct tokens — a full
    // (source, token) shuffle, the widest shape a text pipeline emits);
    // the library default is the HLL++ sketch (fixed state, mergeable
    // map-side), drift-bounded against exact in QualityQuantilesSpec.
    q("x_cardinality_profile",
      """WITH t AS (SELECT doc_id, source,
        |            list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                        x -> x <> '') AS toks FROM documents),
        |tok AS (SELECT source, doc_id, unnest(toks) AS tok FROM t)
        |SELECT source, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_tokens,
        |       count(DISTINCT tok) AS distinct_tokens
        |FROM tok GROUP BY source ORDER BY source""") { (s, dir) =>
      Corpus.cardinalityProfile(t(s, dir, "documents"), "text", "source",
          "doc_id", exact = true)
        .orderBy("source")
    },

    // Language ID: argmax of stopword hits per language profile, ties to
    // the first profile in fixed order (en, de, es, fr), 'und' when zero.
    q("x_langid",
      """SELECT doc_id,
        |  CASE greatest(en_hits, de_hits, es_hits, fr_hits)
        |    WHEN 0 THEN 'und'
        |    WHEN en_hits THEN 'en'
        |    WHEN de_hits THEN 'de'
        |    WHEN es_hits THEN 'es'
        |    ELSE 'fr' END AS predicted_lang
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the','a','of'))) AS en_hits,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x IN ('der','die','das'))) AS de_hits,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x IN ('el','la','los'))) AS es_hits,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x IN ('le','les','des'))) AS fr_hits
        |  FROM documents) ORDER BY doc_id""") { (s, dir) =>
      val toks = t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
      val withHits = langProfiles.foldLeft(toks) { case (df, (lang, words)) =>
        df.withColumn(s"${lang}_hits",
          size(filter(col("toks"),
            x => words.map(w => x === w).reduce(_ || _))))
      }
      val best = greatest(langProfiles.map(p => col(s"${p._1}_hits")): _*)
      withHits.select(col("doc_id"),
        when(best === 0, "und")
          .when(col("en_hits") === best, "en")
          .when(col("de_hits") === best, "de")
          .when(col("es_hits") === best, "es")
          .otherwise("fr").as("predicted_lang"))
        .orderBy("doc_id")
    },

    // Quality scoring: token count, mean token length, stopword ratio,
    // alpha ratio — combined into a 0..1-ish score. Ratios use DECIMAL to
    // keep cross-engine reproducibility.
    q("x_quality_score",
      """SELECT doc_id, n_tokens,
        |       CAST(round(CAST(stop_hits AS DECIMAL(18,6)) /
        |                  n_tokens, 4) AS DOUBLE) AS stopword_ratio,
        |       CAST(round(CAST(n_chars_text AS DECIMAL(18,6)) /
        |                  n_tokens, 4) AS DOUBLE) AS mean_token_len
        |FROM (
        |  SELECT doc_id,
        |         len(list_filter(string_split(trim(text), ' '),
        |             x -> x <> '')) AS n_tokens,
        |         len(list_filter(string_split(text, ' '),
        |             x -> x IN ('the','a','of','and'))) AS stop_hits,
        |         length(replace(text, ' ', '')) AS n_chars_text
        |  FROM documents)
        |WHERE n_tokens > 0 ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", filter(split(trim(col("text")), " "),
          x => x =!= ""))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("stop_hits",
          size(filter(split(col("text"), " "),
            x => x === "the" || x === "a" || x === "of" || x === "and"))
            .cast("long"))
        .withColumn("n_chars_text",
          length(regexp_replace(col("text"), " ", "")).cast("long"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_tokens"),
          round(col("stop_hits").cast("decimal(18,6)") / col("n_tokens"), 4)
            .cast("double").as("stopword_ratio"),
          round(col("n_chars_text").cast("decimal(18,6)") / col("n_tokens"), 4)
            .cast("double").as("mean_token_len"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + BPE-ish regex pieces
    q("x_token_count",
      """SELECT doc_id,
        |       len(list_filter(string_split(trim(text), ' '),
        |           x -> x <> '')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS piece_tokens
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(split(trim(col("text")), " "), x => x =!= ""))
            .cast("long").as("ws_tokens"),
          size(expr("regexp_extract_all(text, '([a-z]+|[0-9]+)', 1)"))
            .cast("long").as("piece_tokens"))
        .orderBy("doc_id")
    },

    // Document fingerprint: winnowing-style — minimum hash over word
    // 3-shingles (md5 as the hash family)
    q("x_fingerprint",
      """SELECT doc_id, min(md5(shingle)) AS fingerprint FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |         AS shingle
        |  FROM (SELECT doc_id, list_filter(string_split(trim(text), ' '),
        |                x -> x <> '') AS toks FROM documents)
        |  WHERE len(toks) >= 3)
        |GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      val toks = graft.core.FanOut(t(s, dir, "documents"))
        .withColumn("toks", filter(split(trim(col("text")), " "),
          x => x =!= ""))
        .filter(size(col("toks")) >= 3)
      toks
        .withColumn("shingle", explode(expr(
          """transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin)))
        .groupBy("doc_id")
        .agg(min(md5(col("shingle"))).as("fingerprint"))
        .orderBy("doc_id")
    },
    // Character-level Shannon entropy (quality signal: gibberish and
    // boilerplate both sit at entropy extremes)
    q("x_char_entropy",
      """SELECT doc_id,
        |       CAST(round(CAST(-sum(p * ln(p)) AS DECIMAL(18,6)), 4)
        |            AS DOUBLE) AS entropy
        |FROM (
        |  SELECT doc_id,
        |         CAST(count(*) AS DOUBLE) /
        |           sum(count(*)) OVER (PARTITION BY doc_id) AS p
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  GROUP BY doc_id, ch)
        |GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val chars = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
      val freq = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy("doc_id")
      freq
        .withColumn("p", col("n").cast("double") / sum("n").over(tot))
        .groupBy("doc_id")
        .agg(round((-sum(col("p") * log(col("p")))).cast("decimal(18,6)"), 4)
          .cast("double").as("entropy"))
        .orderBy("doc_id")
    },

    // Repetition ratio: distinct tokens / total tokens (near-1 = diverse,
    // low = repetitive boilerplate)
    q("x_repetition",
      """SELECT doc_id,
        |       CAST(round(CAST(len(list_distinct(toks)) AS DECIMAL(18,6)) /
        |            len(toks), 4) AS DOUBLE) AS distinct_ratio
        |FROM (SELECT doc_id, list_filter(string_split(trim(text), ' '),
        |              x -> x <> '') AS toks FROM documents)
        |WHERE len(toks) > 0 ORDER BY doc_id""") { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks",
          filter(split(trim(col("text")), " "), x => x =!= ""))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          round(size(array_distinct(col("toks"))).cast("decimal(18,6)") /
            size(col("toks")), 4).cast("double").as("distinct_ratio"))
        .orderBy("doc_id")
    },

    // Gopher-style top-2-gram character fraction: the repetition signal
    // unigram diversity misses — a doc looping one PHRASE of common
    // words keeps distinct_ratio healthy while top_char_frac spikes.
    // Every stage is partitioned by doc (gram count with map-side
    // combine, per-doc top-1 min_by agg): linear, no sort, no global order.
    q("x_top_ngram",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         list_sum(list_transform(toks, x -> len(x))) AS total_chars,
        |         unnest(list_transform(range(0, len(toks) - 1),
        |                i -> toks[i + 1] || ' ' || toks[i + 2])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |c AS (
        |  SELECT doc_id, total_chars, gram, count(*) AS cnt
        |  FROM g GROUP BY doc_id, total_chars, gram)
        |SELECT doc_id, gram AS top_gram, cnt AS top_cnt,
        |       CAST(round(CAST(cnt * (len(gram) - 1) AS DOUBLE)
        |                  / total_chars, 4) AS DOUBLE) AS top_char_frac
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |              ORDER BY cnt DESC, gram) AS rn FROM c)
        |WHERE rn = 1 ORDER BY doc_id""") { (s, dir) =>
      Corpus.topNgramCharFrac(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
  )
}
