package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilarityLibSpec extends AnyFunSuite with SparkTestSession {

  private def vecs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),   // close to 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.1f)),   // close to 3
      (5L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("id", "vec")
  }

  test("int8_quantize_native: floor(v*127/max|v|), zeros, null element") {
    val sp = spark
    import sp.implicits._
    val out = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),   // zero vector → all-zero q
      (3L, Array(-2.0f, 2.0f, 1.0f)))
      .toDF("id", "vec")
      .select(col("id"), call_function("int8_quantize_native", col("vec")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) == Seq(127, math.floor(-0.5 * 127).toInt, // -64
      math.floor(0.25 * 127).toInt)) // 31
    assert(out(2L) == Seq(0, 0, 0))
    assert(out(3L) == Seq(-127, 127, math.floor(1.0 * 127 / 2.0).toInt)) // 63
    // quantized dot rides array_dot_native's int path, integer-exact
    val d = Seq((Array(127, -64, 31), Array(-127, 127, 63)))
      .toDF("a", "b")
      .select(call_function("array_dot_native", col("a"), col("b")))
      .head().getDouble(0)
    assert(d == (127.0 * -127 + -64.0 * 127 + 31.0 * 63))
    // null element nulls the whole quantized array (HOF mirror)
    val n = Seq((9L, Array[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("id", "vec")
      .select(call_function("int8_quantize_native", col("vec")))
      .head()
    assert(n.isNullAt(0))
  }

  test("x_ann_ivf_pruned: the list scan is partition-pruned, results match x_ann_ivf") {
    val sp = spark
    val dir = "/root/testdata/sf0.001"
    val pruned = graft.SparkEntry.queries("x_ann_ivf_pruned")(sp, dir)
    val prunedRows = pruned.collect().toSeq
    // byte-identical to the shuffle-free equi-join formulation
    val base = graft.SparkEntry.queries("x_ann_ivf")(sp, dir).collect().toSeq
    assert(prunedRows == base)
    // plan pin: the inverted-list scan must carry a dynamic partition
    // pruning subquery (only probed list directories are read) — without
    // it the layout is just a slower full scan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case o => o.children
      }
      p +: inner.flatMap(nodes)
    }
    val scans = nodes(pruned.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("graft_ivf_lists")) =>
        f
    }
    assert(scans.nonEmpty, "expected a scan of the partitioned list layout")
    assert(scans.exists(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
      s"expected dynamic partition pruning on the list scan; filters were " +
        scans.map(_.partitionFilters).mkString("; "))
  }

  test("brute-force topK ranks by cosine") {
    val probes = vecs.filter(col("id") === 1L)
    val top = Similarity.topK(probes, vecs, "id", "vec", 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq == Seq((2L, 1), (3L, 2)) ||
      top.head == ((2L, 1))) // neighbor 2 must rank first
  }

  test("zero-norm vectors never rank: NaN cosine is guarded out") {
    val sp = spark
    import sp.implicits._
    val corpus = vecs.union(
      Seq((99L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "vec"))
    val probes = corpus.filter(col("id") === 1L)
    // without the guard the zero vector's 0/0 = NaN sorts ABOVE every
    // real cosine and becomes the probe's #1 neighbor
    val top = Similarity.topK(probes, corpus, "id", "vec", 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(!top.contains(99L) && top.head == 2L)
    // and a zero-norm PROBE emits no rows rather than NaN garbage
    val zp = Similarity.topK(corpus.filter(col("id") === 99L),
      corpus, "id", "vec", 2)
    assert(zp.count() == 0)
  }

  test("semanticDedup keeps the first arrival of each near-dup group") {
    val sp = spark
    import sp.implicits._
    // clusters: {1,2} near x-axis (cos ≈ .9939 > .95 → 2 is 1's dup),
    // {3,4} near y-axis (4 is 3's dup); 5 assigns to centroid 1 on a
    // 0-cosine tie but is nobody's dup; 6 is zero-norm (no cosine)
    val corpus = vecs.union(
      Seq((6L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "vec"))
    val cent = Seq((1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "vec")
    val out = Similarity.semanticDedup(corpus, cent, "id", "vec", 0.95)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
          r.getBoolean(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(1L) == ((None, true)))            // first in its cluster
    assert(out(2L)._2 == false                   // removed: dup of 1
      && out(2L)._1.exists(c => c > 0.99 && c < 1.0))
    assert(out(3L) == ((None, true)))
    assert(out(4L)._2 == false && out(4L)._1.exists(_ > 0.99))
    assert(out(5L) == ((Some(0.0), true)))       // orthogonal cluster-mate
    assert(out(6L)._1.isEmpty && out(6L)._2)     // zero-norm: kept, no prior
  }

  test("semanticDedup maxPriors compares only against the cluster prefix") {
    val sp = spark
    import sp.implicits._
    // one cluster; the dup pair (2, 3) lives wholly in the tail
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f)))  // dup of 2 (cos ≈ .9939)
      .toDF("id", "vec")
    val cent = Seq((1L, Array(1.0, 0.0, 0.0))).toDF("centroid_id", "vec")
    def kept(maxPriors: Option[Int]) =
      Similarity.semanticDedup(corpus, cent, "id", "vec", 0.95, maxPriors)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // exact: 3 is removed as 2's dup
    assert(kept(None) == Map(1L -> true, 2L -> true, 3L -> false))
    // cap 1: only id 1 is a prior — the tail pair is the documented miss
    assert(kept(Some(1)) == Map(1L -> true, 2L -> true, 3L -> true))
    // cap 2: priors {1, 2} cover the pair again
    assert(kept(Some(2)) == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("incrementalSemanticDedup: index dup, batch dup, anchor budget") {
    val sp = spark
    import sp.implicits._
    val index = Seq((1L, Array(1.0f, 0.0f, 0.0f), 1L))
      .toDF("id", "vec", "centroid_id")
    val cent = Seq((1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "vec")
    val delta = Seq(
      (10L, Array(0.95f, 0.05f, 0.0f)), // c1, cos to anchor ≈ .9986
      (11L, Array(0.0f, 1.0f, 0.0f)),   // c2, first arrival
      (12L, Array(0.0f, 0.9f, 0.1f)),   // c2, dup of batch-mate 11
      (13L, Array(0.0f, 0.0f, 1.0f)))   // 0-cos tie → c1, kept
      .toDF("id", "vec")
    val (dec, adm) = Similarity.incrementalSemanticDedup(
      delta, index, cent, "id", "vec", 0.95, maxPriors = 2)
    val d = dec.collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(d(10L) == ((true, false, false)))
    assert(d(11L) == ((false, false, true)))
    assert(d(12L) == ((false, true, false)))
    assert(d(13L) == ((false, false, true)))
    // anchor budget: c1 holds 1 of 2 slots → 13 fits; c2 empty → 11 fits
    assert(adm.collect().map(_.getLong(0)).toSet == Set(11L, 13L))
    // tighter budget: c1 is full, 13 is kept but NOT admitted as anchor
    val (_, adm1) = Similarity.incrementalSemanticDedup(
      delta, index, cent, "id", "vec", 0.95, maxPriors = 1)
    assert(adm1.collect().map(_.getLong(0)).toSet == Set(11L))
  }

  test("IVF: assignment routes to nearest centroid; search stays in partition") {
    val sp = spark
    import sp.implicits._
    val centroids = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f))).toDF("centroid_id", "vec")
    val assigned = Similarity.assignToCentroids(vecs, centroids, "id", "vec")
    val byId = assigned.select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 10L && byId(2L) == 10L)
    assert(byId(3L) == 20L && byId(4L) == 20L)
    val probes = vecs.filter(col("id") === 2L)
    val hits = Similarity.ivfTopK(probes, assigned, centroids, "id", "vec", 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    // partition of centroid 10 only: neighbor 1 (and never 3/4/5)
    assert(hits.contains(1L))
    assert(!hits.exists(Set(3L, 4L)))
  }

  test("IVF multi-probe recovers the cross-boundary neighbor nprobe=1 misses") {
    val sp = spark
    import sp.implicits._
    val centroids = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f))).toDF("centroid_id", "vec")
    // vec 6 lives in list 20 but is the TRUE nearest neighbor of probe 7,
    // which assigns to list 10 (the Voronoi-boundary case): nprobe=1
    // cannot see it, nprobe=2 must rank it first.
    val corpus = vecs.union(
      Seq((6L, Array(0.7f, 0.9f, 0.0f))).toDF("id", "vec"))
    val assigned = Similarity.assignToCentroids(corpus, centroids, "id", "vec")
    assert(assigned.filter(col("id") === 6L)
      .select("centroid_id").head().getLong(0) == 20L)
    val probe = Seq((7L, Array(0.8f, 0.75f, 0.0f))).toDF("id", "vec")
    assert(Similarity
      .assignToCentroids(probe, centroids, "id", "vec")
      .select("centroid_id").head().getLong(0) == 10L)
    val one = Similarity.ivfTopK(probe, assigned, centroids, "id", "vec", 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!one.contains(6L)) // the recall cliff
    val two = Similarity
      .ivfTopK(probe, assigned, centroids, "id", "vec", 3, nprobe = 2)
      .orderBy("rank").collect()
    assert(two.head.getAs[Long]("neighbor_id") == 6L)
    // multi-probe widens the pool: the recovered neighbor displaces the
    // weakest nprobe=1 hit (vec 5, the zero-cosine tie) from the top-3
    assert(two.map(_.getAs[Long]("neighbor_id")).toSet == Set(6L, 2L, 1L))
  }

  test("trained IVF recall on a 2000-vector planted-cluster corpus") {
    val sp = spark
    import sp.implicits._
    // 8 planted unit directions in 16-dim; each vector = its cluster's
    // direction plus small deterministic per-coordinate jitter (LCG —
    // no RNG object, reruns identical). Within-cluster cosine >> cross.
    val dim = 16
    val corpus = (0 until 2000).map { i =>
      val c = i % 8
      val vec = Array.tabulate(dim) { j =>
        val base = if (j == 2 * c || j == 2 * c + 1) 1.0f else 0.0f
        val jitter = (((i * 1103515245L + j * 12345L) % 1000L) / 10000.0f)
        base + jitter
      }
      (i.toLong, vec)
    }.toDF("id", "vec")
    val probes = corpus.filter(col("id") % 100 === 0) // 20 probes
    val exact = Similarity.topK(probes, corpus, "id", "vec", k = 10)
    val cent = Similarity.trainCentroids(corpus, "id", "vec", k = 8,
      iters = 3)
    val assigned = Similarity.assignToCentroids(corpus, cent, "id", "vec")
    val ann = Similarity.ivfTopK(probes, assigned, cent, "id", "vec",
      k = 10, nprobe = 2)
    val recall = Similarity.recallAtK(ann, exact)
      .agg(avg("recall")).collect().head.getDouble(0)
    // searching 2 of 8 lists (≤ 1/4 of the corpus) must keep ≥ 90% of
    // the true top-10 — the planted structure is what IVF exploits
    assert(recall >= 0.9, s"mean recall@10 = $recall")
  }

  test("x_ann_recall_planted path: seeded IVF recall 1.0 on planted corpus") {
    val sp = spark
    import sp.implicits._
    // the benched/oracled x_ann_recall_planted shape, end to end: the
    // deterministic planted corpus (derived from vec_id alone), label
    // seeds as centroids, single-list IVF — structure must carry the
    // gauge to >= 0.9 (here exactly 1.0: candidate lists contain every
    // cluster mate, and exact top-5 is all mates).
    val ids = (0L until 400L).toDF("vec_id")
    val e = SimilarityQueries.plantedCorpus(ids)
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding"))
    val exact = Similarity.topK(probes, e, "vec_id", "embedding", k = 5)
    val seeds = e.groupBy(col("label").as("s_label"))
      .agg(min("vec_id").as("mv"))
    val cent = e.join(broadcast(seeds), e("label") === seeds("s_label") &&
        e("vec_id") === seeds("mv"))
      .select(col("s_label").as("centroid_id"), col("embedding").as("vec"))
    val assigned = e.select(col("vec_id"), col("embedding"),
      col("label").as("centroid_id"))
    val ann = Similarity.ivfTopK(probes, assigned, cent,
      "vec_id", "embedding", k = 5)
    val recall = Similarity.recallAtK(ann, exact)
      .agg(avg("recall")).collect().head.getDouble(0)
    assert(recall >= 0.9, s"mean planted recall@5 = $recall")
  }

  test("recallAtK: trained IVF scores 1.0 on planted clusters") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.05f, 0.95f)),
      (6L, Array(0.1f, 0.9f)))
      .toDF("id", "vec")
    val probes = corpus.filter(col("id").isin(1L, 4L))
    val exact = Similarity.topK(probes, corpus, "id", "vec", k = 2)
    val cent = Similarity.trainCentroids(corpus, "id", "vec", k = 2,
      iters = 4)
    val assigned = Similarity.assignToCentroids(corpus, cent, "id", "vec")
    val ann = Similarity.ivfTopK(probes, assigned, cent, "id", "vec", k = 2)
    val recall = Similarity.recallAtK(ann, exact)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // within a planted cluster the trained single-list search is exact
    assert(recall == Map(1L -> 1.0, 4L -> 1.0))
    // sanity: a deliberately WRONG assignment (swap the two lists) makes
    // the same gauge read 0 — the metric moves in the right direction
    val swapped = assigned.withColumn("centroid_id",
      when(col("centroid_id") === 1L, 2L).otherwise(1L))
    val bad = Similarity.ivfTopK(probes, swapped, cent, "id", "vec", k = 2)
    val badRecall = Similarity.recallAtK(bad, exact)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(badRecall.values.forall(_ == 0.0))
  }

  test("trainCentroids converges to the planted clusters deterministically") {
    val sp = spark
    import sp.implicits._
    // two planted directions; init takes ids 1-2 (both near (1,0)), so
    // convergence REQUIRES the update step to pull centroid 2 across
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.05f, 0.95f)),
      (6L, Array(0.1f, 0.9f)))
      .toDF("id", "vec")
    val cent = Similarity.trainCentroids(corpus, "id", "vec", k = 2,
      iters = 4)
    assert(cent.count() == 2)
    val assigned = Similarity
      .assignToCentroids(corpus, cent, "id", "vec")
      .select("id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(1L) == assigned(2L) && assigned(2L) == assigned(3L))
    assert(assigned(4L) == assigned(5L) && assigned(5L) == assigned(6L))
    assert(assigned(1L) != assigned(4L))
    // deterministic: a second training run produces identical vectors
    val v1 = cent.orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1)).toSeq
    val v2 = Similarity.trainCentroids(corpus, "id", "vec", 2, 4)
      .orderBy("centroid_id").collect().map(_.getSeq[Double](1)).toSeq
    assert(v1 == v2)
    // the trained quantizer drives the IVF search end-to-end
    val corpusAssigned = Similarity
      .assignToCentroids(corpus, cent, "id", "vec")
    val probe = Seq((7L, Array(0.92f, 0.08f))).toDF("id", "vec")
    val top = Similarity
      .ivfTopK(probe, corpusAssigned, cent, "id", "vec", k = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top.toSet.subsetOf(Set(1L, 2L, 3L)))
  }

  private def lshVecs = {
    val sp = spark
    import sp.implicits._
    // two planted near-dup groups + an isolated vector, 8-dim
    Seq(
      (1L, Array(1.0f, 0.2f, -0.3f, 0.8f, 0.1f, -0.5f, 0.4f, 0.9f)),
      (2L, Array(1.0f, 0.2f, -0.3f, 0.8f, 0.1f, -0.5f, 0.4f, 0.9f)),
      (3L, Array(0.99f, 0.21f, -0.3f, 0.8f, 0.1f, -0.5f, 0.4f, 0.9f)),
      (4L, Array(-0.7f, 0.6f, 0.5f, -0.2f, 0.9f, 0.3f, -0.8f, 0.1f)),
      (5L, Array(-0.7f, 0.6f, 0.5f, -0.2f, 0.9f, 0.3f, -0.8f, 0.1f)),
      (6L, Array(0.1f, -0.9f, 0.2f, 0.1f, -0.4f, 0.7f, 0.3f, -0.6f)))
      .toDF("id", "vec")
  }

  test("signLshPairs finds planted near-dups and is sound vs brute force") {
    val got = Similarity.signLshPairs(lshVecs, "id", "vec",
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(t => (t._1, t._2)).toSet
    // identical vectors share every band -> guaranteed candidates
    assert(pairs.contains((1L, 2L)) && pairs.contains((4L, 5L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    // soundness: every emitted pair really is >= threshold (brute force)
    val brute = lshVecs.as("a").join(lshVecs.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    got.foreach { case (a, b, cos) =>
      assert(brute((a, b)) >= 0.9, s"unsound pair ($a,$b)")
      assert(math.abs(brute((a, b)) - cos) < 1e-5)
    }
    // the isolated vector pairs with nobody at this threshold
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("signLshPairs bucket cap drops degenerate buckets") {
    // identical vectors share ALL 4 band buckets; cap 1 drops every
    // bucket they share, so no candidates survive
    val none = Similarity.signLshPairs(lshVecs, "id", "vec",
      threshold = 0.0, maxBucketSize = 1).count()
    assert(none == 0)
  }
}
