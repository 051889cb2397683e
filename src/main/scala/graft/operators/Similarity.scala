package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Library API for embedding similarity search (the parameterized form of
  * SimilarityQueries): brute-force top-k for bounded probe sets and the
  * IVF partition path for corpus-scale search.
  */
object Similarity {

  /** Native codegen'd dot product ([[graft.expr.ArrayDotExpr]], resolved
    * through the GraftExtensions function registry): the HOF form
    * (`aggregate(zip_with(...))`) is CodegenFallback — interpreted per
    * pair — and an unrolled `element_at` chain overflows the codegen
    * method limit; both run the O(pairs × dims) verify loop ~20× slower
    * than this compiled loop. Null when either input is null, lengths
    * differ, or an element is null (the HOF semantics, now explicit). */
  private def dot(x: Column, y: Column): Column =
    call_function("array_dot_native", x, y)

  /** Cosine similarity between two Array[Float]/Array[Double] columns
    * (computed in double, codegen'd — no UDF). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** The vector's L2 norm — precompute this per SIDE before a similarity
    * join: inside the join [[cosine]] would re-derive both norms per
    * PAIR, tripling the flops of the hot loop (the per-row value is
    * bit-identical either way, so results don't change). */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Brute-force top-k neighbors for each probe row. Probes must be a
    * bounded set (broadcast); corpus side streams map-side, with norms
    * precomputed per side so the pair loop is one dot product. Returns
    * (probe_id, neighbor_id, cos_sim, rank). */
  def topK(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // zero-norm guard: a zero vector's cosine is 0/0 = NaN, and Spark
    // orders NaN ABOVE every real value — one zero embedding would rank
    // as every probe's #1 neighbor. A direction-less vector has no
    // cosine neighbors; both sides drop them.
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("_pv"))
      .withColumn("_pn", l2Norm(col("_pv")))
      .filter(col("_pn") > 0)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", l2Norm(col("_cv")))
      .filter(col("_cn") > 0)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(p).join(c, col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("_pv"), col("_cv")) / (col("_pn") * col("_cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Recall of an ANN top-k result against the exact top-k: per probe,
    * the fraction of true neighbors the ANN list captured. The quality
    * gauge for tuning IVF's k/nprobe (the recall-vs-cost dial) — run it
    * on a sampled probe set, not the corpus: both inputs are top-k
    * frames, so the join is k-rows-per-probe tiny regardless of corpus
    * size. Denominator is the probe's ACTUAL exact-result size (< k on
    * small corpora), so recall is well-defined at every scale. */
  def recallAtK(ann: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select("probe_id", "neighbor_id")
      .join(ann.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("probe_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("n_true"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_true"), 4).as("recall"))
  }

  /** IVF assignment: the `nprobe` nearest centroids per row → partition
    * keys. Centroids must be small (broadcast): (centroid_id, vec).
    * `nprobe` = 1 (the default) is the classic single-list assignment
    * used to PARTITION a corpus; searches should probe several lists
    * (see [[ivfTopK]]) because a probe near a centroid boundary has its
    * true neighbors split across the adjacent lists — the recall cliff
    * of nprobe=1. Emits one row per (row, probed centroid) with
    * `probe_rank` (1 = nearest). */
  def assignToCentroids(df: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val c = centroids.select(col("centroid_id"), col("vec").as("_cent"))
      .withColumn("_centn", l2Norm(col("_cent")))
    val w = Window.partitionBy(idCol).orderBy(col("_ccos").desc,
      col("centroid_id"))
    df.withColumn("_vn", l2Norm(col(vecCol)))
      .crossJoin(broadcast(c))
      // zero-norm guard: a 0/0 double division yields NaN (not an ANSI
      // error — that applies to integral/decimal division only), and
      // NaN sorts ABOVE every real double in Spark's ordering, so an
      // unguarded zero-norm CENTROID would rank first for every row and
      // swallow the whole corpus. Null cosine instead: the null sorts
      // last and the row assigns by the centroid_id tie-break.
      .withColumn("_ccos", when(col("_vn") > 0 && col("_centn") > 0,
        round(dot(col(vecCol), col("_cent")) /
          (col("_vn") * col("_centn")), 6)))
      .withColumn("_crn", row_number().over(w))
      .filter(col("_crn") <= nprobe)
      .withColumn("probe_rank", col("_crn"))
      .drop("_cent", "_centn", "_vn", "_ccos", "_crn")
  }

  /** Random-hyperplane (sign) LSH near-neighbor pairs over an embedding
    * column — the corpus×corpus complement of [[topK]]'s bounded-probe
    * path: candidates come from an equi-join on (band, chunk) of a
    * sign-bit signature, never an all-pairs product, then verify with the
    * exact double cosine. Returns (id_a, id_b, cos_sim), id_a < id_b,
    * cos_sim ≥ threshold.
    *
    * Sign bits are decided over INTEGER-quantized vectors (round(v×1000))
    * against small integer hyperplanes derived from (dim, plane) index
    * arithmetic — integer dot products make the bit decisions exact and
    * engine-portable, where a float sum landing at the sign boundary
    * could flip a bit per engine and desynchronize buckets.
    *
    * Recall: P[one bit agrees] = 1 − θ/π for angle θ, so a pair at
    * cosine τ survives ≥1 of `bands` chunks with probability
    * 1 − (1 − p^(bits/bands))^bands — narrower chunks trade candidate
    * volume for recall exactly as in MinHash LSH banding. This is a
    * candidate GENERATOR (recall < 1 by design); exact-above-threshold
    * recall needs the brute-force [[topK]] or the IVF path.
    *
    * `maxBucketSize` guards degenerate buckets (e.g. zero vectors all
    * hashing to signature 0): a bucket of k members emits O(k²)
    * candidates, so buckets above the cap are dropped — their members
    * still pair through their other, more selective bands.
    *
    * Chunk width (bits/bands) must be sized to the corpus: a chunk takes
    * 2^width distinct values, so expected bucket size is N/2^width — at
    * 4-bit chunks every bucket holds 1/16th of the corpus and the band
    * join degenerates toward all-pairs. Size width ≈ log2(N) − log2(target
    * bucket size); the default (32 bits, 4 bands → 8-bit chunks) suits
    * ~10^5-row partitions, larger corpora should raise `bits` (≤ 60).
    * [[signLshWidthFor]] is that sizing rule as code — the production
    * path counts the corpus once (a plan-time decision, like AQE's
    * runtime statistics) and passes `bits = bands × width`. */
  def signLshPairs(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, threshold: Double = 0.3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(bits > 0 && bits <= 60 && bits % bands == 0,
      "bands must divide bits (≤60)")
    val width = bits / bands
    // Signature = bits sign-plane dots in ONE compiled loop
    // (SignLshSigExpr); the HOF per-plane formulation was interpreted and
    // allocated two arrays per plane per row. One signature pass,
    // materialized (localCheckpoint) so the band self-join reads
    // ~24 B/row instead of recomputing bits×dims integer products per
    // side.
    val qv = transform(col("vec"),
      v => round(v.cast("double") * 1000).cast("long"))
    val base = graft.core.FanOut(df)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", call_function("sign_lsh_sig_native", qv, lit(bits)))
      .withColumn("_n", l2Norm(col("vec")))
      .localCheckpoint()
    val chunkCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        expr(s"shiftrightunsigned(sig, ${b * width}) & ${(1L << width) - 1}")
          .as("chunk"))
    }
    // The band self-join and the candidate dedup run on NARROW rows
    // (id + band + chunk): shuffling the vectors through the join would
    // move two embeddings per candidate (a 60× wider shuffle); instead
    // the deduped pair list joins the vectors back afterwards — the
    // vector side is an equi-join on id that AQE broadcasts when small.
    val banded = base
      .select(col("id"), explode(array(chunkCols: _*)).as("bc"))
      .select(col("id"),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val capped = banded
      .withColumn("_bn",
        count(lit(1)).over(Window.partitionBy("band", "chunk")))
      .filter(col("_bn") <= maxBucketSize).drop("_bn")
    val cand = capped.select(col("id").as("id_a"), col("band"), col("chunk"))
      .join(capped.select(col("id").as("id_b"), col("band"), col("chunk")),
        Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      // dedup BEFORE verification so a pair sharing several bands pays
      // for one cosine, not one per shared band
      .select("id_a", "id_b").distinct()
    // verify: native codegen'd dot — the O(pairs × dims) hot loop
    cand
      .join(base.select(col("id").as("id_a"), col("vec").as("_va"),
        col("_n").as("_na")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vec").as("_vb"),
        col("_n").as("_nb")), Seq("id_b"))
      .withColumn("_cos", dot(col("_va"), col("_vb")) /
        (col("_na") * col("_nb")))
      // NaN guard: Spark evaluates NaN >= t as TRUE (NaN sorts above
      // all reals), so a zero-norm vector's 0/0 pair would pass the
      // threshold — require positive norms on both sides
      .filter(col("_na") > 0 && col("_nb") > 0 &&
        col("_cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_cos"), 6).as("cos_sim"))
  }

  /** Chunk width for [[signLshPairs]] sized to the corpus: width ≈
    * log2(N / targetBucket) keeps the EXPECTED bucket at `targetBucket`
    * rows, so per-bucket pair emission stays O(targetBucket²) and total
    * candidate volume O(N·targetBucket) — linear in N — instead of the
    * fixed-width N²/2^width. Clamped to [minWidth, maxWidth]: below the
    * floor buckets are selective enough already, above the ceiling the
    * signature runs out of bits (bands × width ≤ 60). */
  def signLshWidthFor(n: Long, targetBucket: Int = 8,
      minWidth: Int = 8, maxWidth: Int = 12): Int = {
    val raw = math.ceil(math.log(n.toDouble / targetBucket) /
      math.log(2.0)).toInt
    math.max(minWidth, math.min(maxWidth, raw))
  }

  /** Deterministic Lloyd's k-means for the IVF coarse quantizer:
    * init = the k lowest-id vectors (no RNG — reruns and engines agree),
    * then `iters` assignment/update rounds. Returns (centroid_id, vec).
    *
    * Scale shape per round: one broadcast cross-join assignment (the
    * same plan [[assignToCentroids]] serves) + one posexplode/groupBy
    * mean — a (k × dim)-keyed shuffle of narrow rows, independent of
    * corpus width. Means accumulate in DECIMAL: a double sum's value
    * depends on partition merge order, so with float accumulation two
    * runs could disagree in the last bit and flip a boundary
    * assignment; exact decimal sums make training a pure function of
    * the input. Centroids localCheckpoint per round (k rows) so the
    * plan does not nest `iters` deep. Empty clusters keep their
    * previous centroid (the standard Lloyd fallback). */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val init = df.orderBy(col(idCol)).limit(k)
      .withColumn("centroid_id",
        row_number().over(Window.orderBy(col(idCol))).cast("long"))
      .select(col("centroid_id"),
        transform(col(vecCol), v => v.cast("double")).as("vec"))
      .localCheckpoint()
    (1 to iters).foldLeft(init) { (cent, _) =>
      val means = assignToCentroids(df, cent, idCol, vecCol)
        .select(col("centroid_id"),
          posexplode(transform(col(vecCol), v => v.cast("double"))))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("col").cast("decimal(28,12)")).cast("double").as("m"))
        .groupBy("centroid_id")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("new_vec"))
      cent.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new_vec"), col("vec")).as("vec"))
        .localCheckpoint()
    }
  }

  /** IVF top-k: probes search their `nprobe` nearest centroids' lists —
    * the similarity join stays an equi-join on centroid_id, fanning each
    * probe out `nprobe` ways instead of 1. The corpus assignment is
    * always single-list (a vector lives in exactly one inverted list),
    * so the per-centroid candidate sets are disjoint and the union needs
    * no dedup before the global per-probe rank. nprobe trades compute
    * (candidates × nprobe) for recall: at nprobe=1 a probe sitting near
    * a Voronoi boundary misses every neighbor filed under the adjacent
    * centroid; probing the k nearest lists is the standard IVF recall
    * lever (FAISS-style), and the scan stays bounded at
    * nprobe/n_centroids of the corpus. */
  def ivfTopK(probes: DataFrame, corpusAssigned: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 1): DataFrame = {
    // zero-norm guard: see topK — NaN cosines sort above every real
    val assignedProbes =
      assignToCentroids(probes, centroids, idCol, vecCol, nprobe)
        .select(col(idCol).as("probe_id"), col(vecCol).as("_pv"),
          col("centroid_id"))
        .withColumn("_pn", l2Norm(col("_pv")))
        .filter(col("_pn") > 0)
    val c = corpusAssigned.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"), col("centroid_id"))
      .withColumn("_cn", l2Norm(col("_cv")))
      .filter(col("_cn") > 0)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(assignedProbes)
      .join(c, Seq("centroid_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("_pv"), col("_cv")) / (col("_pn") * col("_cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos_sim", "rank")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the coarse quantizer,
    * then inside each cluster remove every member whose cosine
    * similarity to some LOWER-id member reaches `threshold` — the
    * public reference implementation's triangular-matrix rule (max over
    * j < i of sim(i, j) decides i's fate), which keeps exactly the
    * first arrival of each semantic near-dup group and never compares
    * across clusters.
    *
    * Scale shape: assignment is [[assignToCentroids]]'s broadcast
    * cross-join; the pairwise check is an equi-join on centroid_id, so
    * candidate volume is Σ|cluster|² — bounded by the quantizer's k,
    * which SemDeDup sizes so clusters stay small (the paper runs
    * k = 50k on LAION; k must grow with N or clusters — and the
    * quadratic pair stage — grow linearly). `maxPriors` is the cap for
    * corpora where that sizing can't hold (duplication floods): each
    * member compares only against its cluster's `maxPriors` LOWEST-id
    * members, making pair volume |c|·M (linear) at the cost of missing
    * dup pairs wholly inside the cluster's tail — the same
    * documented-approximation contract as the LSH hot-bucket cap.
    * Cosines round to 6dp before the max so the keep decision is
    * engine-stable. Zero-norm vectors have no cosine: they are kept and
    * are never a prior. Returns one row per input: (idCol, centroid_id,
    * max_prior_cos — null when the row has no lower-id cluster-mate
    * among the compared priors, kept). */
  def semanticDedup(df: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      maxPriors: Option[Int] = None): DataFrame = {
    maxPriors.foreach(m => require(m >= 1, "maxPriors must be >= 1"))
    val assigned = assignToCentroids(df, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("centroid_id"))
      .withColumn("_n", l2Norm(col(vecCol)))
    val x = assigned.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      col("_n").as("_vn"), col("centroid_id"))
    val priorAll = assigned.filter(col("_n") > 0)
      .select(col(idCol).as("_pid"), col(vecCol).as("_pv"),
        col("_n").as("_pn"), col("centroid_id"))
    // prefix anchors via the two-phase per-key top-k (sc3's shape): a
    // single-window rank would stream a flooded cluster's entire row
    // set through one task — the exact hazard the cap guards against
    val prior = maxPriors.fold(priorAll) { m =>
      Skew.topKPerKey(priorAll, col("centroid_id"), col("_pid"), m,
        asc = true).drop("rank")
    }
    val maxPrior = x.filter(col("_vn") > 0)
      .join(prior, Seq("centroid_id"))
      .filter(col("_pid") < col("_id"))
      .groupBy(col("_id"))
      .agg(max(round(dot(col("_v"), col("_pv")) /
        (col("_vn") * col("_pn")), 6)).as("max_prior_cos"))
    x.join(maxPrior, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("centroid_id"),
        col("max_prior_cos"),
        (col("max_prior_cos").isNull ||
          col("max_prior_cos") < threshold).as("kept"))
  }

  /** Incremental SemDeDup admission — the embedding twin of
    * [[TextDedup.incrementalMinHashDedup]]: decide an arrival batch
    * against the persisted cluster-prefix INDEX (the maxPriors anchors
    * [[semanticDedup]] compares against) plus lower-id batch-mates in
    * the same cluster. Corpus-side cost is one narrow scan of the
    * bounded index (≤ k·maxPriors anchor rows); the admitted corpus's
    * embeddings are never re-read. Within-batch comparison is the
    * triangular rule over the micro-batch, which is bounded by
    * definition. Zero-norm arrivals have no cosine: kept, never a dup,
    * and never admitted as anchors.
    *
    * `index` rows are (idCol, vecCol, centroid_id) — exactly what this
    * function's second return value produces. Returns (decisions,
    * admittedAnchors): decisions = one row per arrival (idCol,
    * centroid_id, dup_of_index, dup_of_delta, keep); admittedAnchors =
    * kept arrivals that still fit their cluster's maxPriors anchor
    * budget — append them to the index and the next batch continues
    * from there. */
  def incrementalSemanticDedup(delta: DataFrame, index: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxPriors: Int = 20): (DataFrame, DataFrame) = {
    require(maxPriors >= 1, "maxPriors must be >= 1")
    val d = assignToCentroids(delta, centroids, idCol, vecCol)
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        col("centroid_id"))
      .withColumn("_vn", l2Norm(col("_v")))
      .localCheckpoint()
    val live = d.filter(col("_vn") > 0)
    val ix = index.select(col(idCol).as("_aid"), col(vecCol).as("_av"),
        col("centroid_id"))
      .withColumn("_an", l2Norm(col("_av")))
      .filter(col("_an") > 0)
    def isDup(prior: DataFrame, pv: String, pn: String, pid: Column) =
      live.join(prior, Seq("centroid_id"))
        .filter(pid && round(dot(col("_v"), col(pv)) /
          (col("_vn") * col(pn)), 6) >= threshold)
        .select(col("_id")).distinct()
    val dupIx = isDup(ix, "_av", "_an", lit(true))
      .withColumn("dup_of_index", lit(true))
    val dupDelta = isDup(
      live.select(col("_id").as("_pid"), col("_v").as("_pv"),
        col("_vn").as("_pn"), col("centroid_id")),
      "_pv", "_pn", col("_pid") < col("_id"))
      .withColumn("dup_of_delta", lit(true))
    val decisions = d.select(col("_id"), col("centroid_id"))
      .join(dupIx, Seq("_id"), "left")
      .join(dupDelta, Seq("_id"), "left")
      .select(col("_id"), col("centroid_id"),
        coalesce(col("dup_of_index"), lit(false)).as("dup_of_index"),
        coalesce(col("dup_of_delta"), lit(false)).as("dup_of_delta"))
      .withColumn("keep", !col("dup_of_index") && !col("dup_of_delta"))
    // anchor budget: existing index occupancy per cluster (≤ k rows,
    // broadcast) + kept arrivals in id order fill the remaining slots
    val occupancy = ix.groupBy("centroid_id").count()
      .select(col("centroid_id"), col("count").as("_occ"))
    val wA = Window.partitionBy("centroid_id").orderBy(col("_id"))
    val admitted = live
      .join(decisions.filter(col("keep")).select("_id"), Seq("_id"))
      .withColumn("_arn", row_number().over(wA))
      .join(broadcast(occupancy), Seq("centroid_id"), "left")
      .filter(col("_arn") + coalesce(col("_occ"), lit(0L)) <= maxPriors)
      .select(col("_id").as(idCol), col("_v").as(vecCol),
        col("centroid_id"))
    (decisions.select(col("_id").as(idCol), col("centroid_id"),
      col("dup_of_index"), col("dup_of_delta"), col("keep")), admitted)
  }
}
