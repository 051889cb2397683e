package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Scale design:
  *  - Brute-force top-k only for a bounded probe set (the 100 TB baseline:
  *    probes broadcast against the corpus, map-side dot products, per-probe
  *    top-k via partial aggregation — never corpus×corpus).
  *  - The scale path is IVF: assign every vector to its nearest coarse
  *    centroid (here: a deterministic per-label seed), probe only matching
  *    partitions — turning the similarity join into an equi-join on the
  *    partition key.
  *  - Cosines are computed in double and rounded before ranking so rank
  *    order is reproducible across engines (float sum-order noise).
  */
object SimilarityQueries extends QueryModule {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** dot(a,b) via the native codegen'd ArrayDotExpr (bit-identical to the
    * HOF zip_with+aggregate form — same left-to-right double summation —
    * but a compiled loop instead of an interpreted CodegenFallback). */
  private def dot(a: Column, b: Column): Column =
    call_function("array_dot_native", a, b)

  /** The label-seeded coarse quantizer every IVF/SemDeDup query here
    * shares: one deterministic seed per label — the label's lowest-
    * vec_id embedding — joined back broadcast. `seedSrc` lets the
    * incremental query derive seeds from the admitted corpus only while
    * still selecting the seed rows from `from`. Returns (idOut, vecOut). */
  private def labelSeededCentroids(from: DataFrame,
      idOut: String = "centroid_id", vecOut: String = "vec",
      seedSrc: Option[DataFrame] = None): DataFrame = {
    val seeds = seedSrc.getOrElse(from)
      .groupBy(col("label").as("s_label"))
      .agg(min("vec_id").as("mv"))
    from.join(broadcast(seeds), from("label") === seeds("s_label") &&
        from("vec_id") === seeds("mv"))
      .select(col("s_label").as(idOut), col("embedding").as(vecOut))
  }

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Oracle-side dot product over unnested (idx, val) pairs — DuckDB list
    * lambdas with index are version-sensitive, so the oracle uses
    * generate_subscripts-free explicit indexing. */
  private val dotSql =
    "list_sum(list_transform(range(1, len(a.embedding) + 1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"

  override val entries: Seq[QueryEntry] = Seq(
    // Brute-force cosine top-k for a probe subset (vec_id % 100 = 0)
    q("x_ann_topk",
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
         |         round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |           AS cos_sim
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM pairs)
         |WHERE rn <= 10 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir)
      // norms precomputed per SIDE (probes + corpus) — inside the join
      // they'd be re-derived per PAIR, tripling the hot-loop flops for a
      // bit-identical value
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        .withColumn("pn", norm(col("pe")))
      val corpus = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce"))
        .withColumn("cn", norm(col("ce")))
      val cos = round(dot(col("pe"), col("ce")) / (col("pn") * col("cn")), 6)
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      broadcast(probes).join(corpus, col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("probe_id", "neighbor_id", "cos_sim")
        .orderBy("probe_id", "cos_sim", "neighbor_id")
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // Embedding-cosine near-duplicate pairs within label partitions.
    // Threshold 0.3 (not the classic 0.9): the fixture embeddings are
    // near-orthogonal random vectors (max within-label cosine ≈ 0.41),
    // so 0.3 keeps the oracle non-vacuous — a handful of pairs at every
    // SF — proving the dot/norm arithmetic and rounding cross-engine
    // rather than comparing two empty sets.
    q("x_embed_neardup",
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       round($dotSql /
         |         (sqrt(list_sum(list_transform(a.embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |          sqrt(list_sum(list_transform(b.embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |         AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE a.vec_id % 20 = 0
         |  AND $dotSql /
         |      (sqrt(list_sum(list_transform(a.embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |       sqrt(list_sum(list_transform(b.embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.3
         |ORDER BY vec_a, vec_b""") { (s, dir) =>
      val e = emb(s, dir)
      val a = e.filter(pmod(col("vec_id"), lit(20)) === 0)
        .select(col("vec_id").as("vec_a"), col("label"),
          col("embedding").as("ea"))
        .withColumn("na", norm(col("ea")))
      val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
        col("embedding").as("eb"))
        .withColumn("nb", norm(col("eb")))
      val cosRaw = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
        .withColumn("cos_raw", cosRaw)
        .filter(col("cos_raw") >= 0.3)
        .select(col("vec_a"), col("vec_b"),
          round(col("cos_raw"), 6).as("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },

    // Int8-QUANTIZED cosine top-k — the memory-bound scale lever for
    // ANN: a 64-dim float corpus is 256 B/vector of shuffle + executor
    // cache, the int8 form is 64 B (4× more corpus per executor-GB;
    // the standard serving compression for embedding search).
    // Quantization (q_i = floor(v_i·127/max|v|), one compiled pass via
    // int8_quantize_native) runs once per row; the scoring join then
    // rides array_dot_native's int path, so the per-pair arithmetic is
    // INTEGER-exact cross-engine — the oracle reproduces quantized
    // cosines to the rounded digit, which float dots can't promise.
    // Probe/top-k shape mirrors x_ann_topk (the labeled brute
    // baseline); at scale the same quantized verify composes with the
    // IVF/LSH candidate generation below instead of a cross join.
    q("x_ann_int8",
      """WITH qv AS (
        |  SELECT vec_id,
        |         CASE WHEN mx > 0
        |           THEN list_transform(emb, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |           ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS q
        |  FROM (SELECT vec_id,
        |               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |               list_max(list_transform(embedding,
        |                  x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings)),
        |pairs AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |         round(
        |           CAST(list_sum(list_transform(range(1, len(a.q) + 1),
        |              i -> a.q[i] * b.q[i])) AS DOUBLE) /
        |           (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x)) AS DOUBLE)) *
        |            sqrt(CAST(list_sum(list_transform(b.q, x -> x * x)) AS DOUBLE))),
        |           6) AS cos_sim
        |  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
        |SELECT probe_id, neighbor_id, cos_sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM pairs)
        |WHERE rn <= 10 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir)
      val base = e.select(col("vec_id"),
        call_function("int8_quantize_native", col("embedding")).as("q"))
      val probes = base.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id").as("probe_id"), col("q").as("pq"))
        .withColumn("pn", sqrt(dot(col("pq"), col("pq"))))
      val corpus = base.select(col("vec_id").as("neighbor_id"),
        col("q").as("cq"))
        .withColumn("cn", sqrt(dot(col("cq"), col("cq"))))
      val cos = round(dot(col("pq"), col("cq")) / (col("pn") * col("cn")), 6)
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      broadcast(probes).join(corpus, col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("probe_id", "neighbor_id", "cos_sim")
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // IVF-style ANN: coarse centroids = the min-vec_id vector per label
    // (deterministic seeds); probes search ONLY their nearest centroid's
    // partition → similarity join becomes an equi-join on label
    q("x_ann_ivf",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS best_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |hits AS (
         |  SELECT s.probe_id, b.vec_id AS neighbor_id,
         |         round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |           AS cos_sim
         |  FROM assign s
         |  JOIN embeddings a ON a.vec_id = s.probe_id
         |  JOIN embeddings b ON b.label = s.best_label
         |                   AND b.vec_id <> s.probe_id)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM hits)
         |WHERE rn <= 5 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir).cache()
      val cent = labelSeededCentroids(e, "c_label", "cemb")
        .withColumn("centn", norm(col("cemb")))
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        .withColumn("pn", norm(col("pe")))
      val centCos = round(dot(col("pe"), col("cemb")) /
        (col("pn") * col("centn")), 6)
      val wAssign = Window.partitionBy("probe_id")
        .orderBy(col("c_cos").desc, col("c_label"))
      val assign = broadcast(probes).crossJoin(broadcast(cent))
        .withColumn("c_cos", centCos)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("pe"), col("pn"),
          col("c_label").as("best_label"))
      val corpus = e.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"), col("embedding").as("ce"))
        .withColumn("cn", norm(col("ce")))
      val cos = round(dot(col("pe"), col("ce")) / (col("pn") * col("cn")), 6)
      val wTop = Window.partitionBy("probe_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      broadcast(assign).join(corpus,
        col("best_label") === col("n_label") &&
          col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos_sim")
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // IVF over a PARTITION-PRUNED layout — the storage-level version of
    // x_ann_ivf's centroid equi-join, and the shape a 100 TB vector
    // store actually takes: the corpus is WRITTEN partitioned by its
    // assigned list (partitionBy(label) — one directory per inverted
    // list), and the probe-side assignment arrives as a broadcast, so
    // Spark's dynamic partition pruning turns the search into a scan of
    // ONLY the probed lists' directories. Nothing outside the probed
    // lists is even read — candidate generation costs I/O proportional
    // to nprobe/nlist of the corpus, not a full scan + filter. Results
    // are byte-identical to x_ann_ivf (same assignment, same scoring);
    // the spec pins the plan: the scan's PartitionFilters carries the
    // dynamicpruning subquery.
    q("x_ann_ivf_pruned",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS best_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |hits AS (
         |  SELECT s.probe_id, b.vec_id AS neighbor_id,
         |         round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |           AS cos_sim
         |  FROM assign s
         |  JOIN embeddings a ON a.vec_id = s.probe_id
         |  JOIN embeddings b ON b.label = s.best_label
         |                   AND b.vec_id <> s.probe_id)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM hits)
         |WHERE rn <= 5 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir).cache()
      // the inverted-list layout: corpus partitioned by assigned list
      // (per-JVM path — see v8's concurrent-driver note)
      // per-JVM path, deleted at JVM exit (see core.Scratch scaladoc)
      val path = graft.core.Scratch.perJvmDir("ivf_lists")
      e.write.mode("overwrite").partitionBy("label").parquet(path)
      val cent = labelSeededCentroids(e, "c_label", "cemb")
        .withColumn("centn", norm(col("cemb")))
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        .withColumn("pn", norm(col("pe")))
      val centCos = round(dot(col("pe"), col("cemb")) /
        (col("pn") * col("centn")), 6)
      val wAssign = Window.partitionBy("probe_id")
        .orderBy(col("c_cos").desc, col("c_label"))
      val assign = broadcast(probes).crossJoin(broadcast(cent))
        .withColumn("c_cos", centCos)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("pe"), col("pn"),
          col("c_label").as("best_label"))
      // the search side reads the PARTITIONED layout — label is now a
      // partition column, so the broadcast join on it triggers dynamic
      // partition pruning: only probed list directories are scanned
      val lists = s.read.parquet(path)
        .select(col("vec_id").as("neighbor_id"),
          col("label").cast("int").as("n_label"), col("embedding").as("ce"))
        .withColumn("cn", norm(col("ce")))
      val cos = round(dot(col("pe"), col("ce")) / (col("pn") * col("cn")), 6)
      val wTop = Window.partitionBy("probe_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      broadcast(assign).join(lists,
        col("best_label") === col("n_label") &&
          col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos_sim")
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // The production configuration: IVF candidate pruning AND int8
    // scoring together. Candidate generation is the same centroid
    // equi-join as x_ann_ivf (at scale: the partition-pruned layout
    // above); the in-list verify runs on int8-quantized vectors — the
    // corpus the executors hold/shuffle for scoring is 1/4 the bytes.
    // Assignment stays full-precision (centroid count is tiny; the
    // memory lever matters on the CORPUS side), which also keeps the
    // assignment identical to x_ann_ivf's, so the two queries search
    // identical lists and differ only in the verify arithmetic —
    // integer-exact cross-engine, like x_ann_int8.
    q("x_ann_ivf_int8",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS best_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |qv AS (
         |  SELECT vec_id, label,
         |         CASE WHEN mx > 0
         |           THEN list_transform(emb, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |           ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS q
         |  FROM (SELECT vec_id, label,
         |               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |               list_max(list_transform(embedding,
         |                  x -> abs(CAST(x AS DOUBLE)))) AS mx
         |        FROM embeddings)),
         |hits AS (
         |  SELECT s.probe_id, b.vec_id AS neighbor_id,
         |         round(
         |           CAST(list_sum(list_transform(range(1, len(a.q) + 1),
         |              i -> a.q[i] * b.q[i])) AS DOUBLE) /
         |           (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x)) AS DOUBLE)) *
         |            sqrt(CAST(list_sum(list_transform(b.q, x -> x * x)) AS DOUBLE))),
         |           6) AS cos_sim
         |  FROM assign s
         |  JOIN qv a ON a.vec_id = s.probe_id
         |  JOIN qv b ON b.label = s.best_label
         |           AND b.vec_id <> s.probe_id)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM hits)
         |WHERE rn <= 5 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir).cache()
      val cent = labelSeededCentroids(e, "c_label", "cemb")
        .withColumn("centn", norm(col("cemb")))
      val quant = call_function("int8_quantize_native", col("embedding"))
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          quant.as("pq"))
        .withColumn("pn", norm(col("pe")))
        .withColumn("pqn", sqrt(dot(col("pq"), col("pq"))))
      val centCos = round(dot(col("pe"), col("cemb")) /
        (col("pn") * col("centn")), 6)
      val wAssign = Window.partitionBy("probe_id")
        .orderBy(col("c_cos").desc, col("c_label"))
      val assign = broadcast(probes).crossJoin(broadcast(cent))
        .withColumn("c_cos", centCos)
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("pq"), col("pqn"),
          col("c_label").as("best_label"))
      // corpus side carries ONLY the quantized form into the verify join
      val lists = e.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"), quant.as("cq"))
        .withColumn("cqn", sqrt(dot(col("cq"), col("cq"))))
      val cos = round(dot(col("pq"), col("cq")) / (col("pqn") * col("cqn")), 6)
      val wTop = Window.partitionBy("probe_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      broadcast(assign).join(lists,
        col("best_label") === col("n_label") &&
          col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos_sim")
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // One Lloyd round of the IVF coarse-quantizer training
    // (Similarity.trainCentroids, iters=1): deterministic lowest-id
    // init, cosine argmax assignment, per-dimension decimal-exact means
    // — the assignment plan is the same broadcast cross-join the search
    // path uses, and the mean is a (k × dim)-keyed narrow shuffle.
    // Iterations beyond 1 are the same round folded (spec-pinned
    // deterministic); one round is what SQL can express non-recursively.
    q("x_ivf_train",
      s"""WITH init AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id,
         |         embedding
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |ass AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT a.vec_id, b.centroid_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.centroid_id) AS rn
         |    FROM embeddings a CROSS JOIN init b)
         |  WHERE rn = 1),
         |dims AS (SELECT unnest(range(0,
         |           (SELECT len(embedding) FROM embeddings LIMIT 1)))
         |           AS pos)
         |SELECT s.centroid_id, p.pos,
         |       round(avg(CAST(e.embedding[p.pos + 1]
         |                      AS DECIMAL(28,12))), 6) AS m
         |FROM ass s
         |JOIN embeddings e USING (vec_id)
         |CROSS JOIN dims p
         |GROUP BY s.centroid_id, p.pos
         |ORDER BY centroid_id, pos""") { (s, dir) =>
      val cent = Similarity.trainCentroids(emb(s, dir),
        "vec_id", "embedding", k = 4, iters = 1)
      cent.select(col("centroid_id"),
          posexplode(col("vec")).as(Seq("pos", "m")))
        .select(col("centroid_id"), col("pos").cast("long").as("pos"),
          round(col("m"), 6).as("m"))
        .orderBy("centroid_id", "pos")
    },

    // IVF multi-probe (nprobe=2): probes search their TWO nearest
    // centroids' lists — the recall lever over x_ann_ivf's nprobe=1
    // (a probe near a Voronoi boundary has true neighbors filed under
    // the adjacent centroid). Lists are disjoint (corpus assignment is
    // single-list) so the union needs no dedup before the global top-5;
    // candidate volume is bounded at 2/n_centroids of the corpus.
    q("x_ann_ivf_nprobe",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS probed_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn <= 2),
         |hits AS (
         |  SELECT s.probe_id, b.vec_id AS neighbor_id,
         |         round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |           AS cos_sim
         |  FROM assign s
         |  JOIN embeddings a ON a.vec_id = s.probe_id
         |  JOIN embeddings b ON b.label = s.probed_label
         |                   AND b.vec_id <> s.probe_id)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM hits)
         |WHERE rn <= 5 ORDER BY probe_id, rn""") { (s, dir) =>
      val e = emb(s, dir).cache()
      val cent = labelSeededCentroids(e)
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id"), col("embedding"))
      val corpusAssigned = e.select(col("vec_id"), col("embedding"),
        col("label").as("centroid_id"))
      Similarity.ivfTopK(probes, corpusAssigned, cent,
          "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("probe_id"), col("neighbor_id"), col("cos_sim"))
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // End-to-end TRAINED IVF: one Lloyd round of the coarse quantizer
    // (x_ivf_train's arithmetic), centroid components quantized to 6dp
    // (the cross-engine-stable representation that oracle proved), then
    // corpus assignment AND probe search against the trained centroids —
    // the full train→assign→search path, not the label-seeded shortcut
    // of x_ann_ivf. Still one broadcast cross-join per assignment and a
    // centroid_id equi-join for the search.
    q("x_ann_ivf_trained", {
      val centDot =
        """list_sum(list_transform(range(1, len(a.embedding) + 1),
          |  i -> CAST(a.embedding[i] AS DOUBLE) * b.cvec[i]))""".stripMargin
      val centCos =
        s"""round($centDot /
           |  (sqrt(list_sum(list_transform(a.embedding,
           |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           |   sqrt(list_sum(list_transform(b.cvec, x -> x * x)))), 6)"""
          .stripMargin
      s"""WITH init AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id,
         |         embedding
         |  FROM embeddings ORDER BY vec_id LIMIT 4),
         |ass0 AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT a.vec_id, b.centroid_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.centroid_id) AS rn
         |    FROM embeddings a CROSS JOIN init b)
         |  WHERE rn = 1),
         |dims AS (SELECT unnest(range(0,
         |           (SELECT len(embedding) FROM embeddings LIMIT 1)))
         |           AS pos),
         |tm AS (
         |  SELECT s.centroid_id, p.pos,
         |         round(avg(CAST(e.embedding[p.pos + 1]
         |                        AS DECIMAL(28,12))), 6) AS m
         |  FROM ass0 s
         |  JOIN embeddings e USING (vec_id)
         |  CROSS JOIN dims p
         |  GROUP BY s.centroid_id, p.pos),
         |cent AS (SELECT centroid_id,
         |                list(CAST(m AS DOUBLE) ORDER BY pos) AS cvec
         |         FROM tm GROUP BY centroid_id),
         |assign AS (
         |  SELECT vec_id AS probe_id, centroid_id AS best_c FROM (
         |    SELECT a.vec_id, b.centroid_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             $centCos DESC, b.centroid_id) AS rn
         |    FROM embeddings a CROSS JOIN cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |corp AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT a.vec_id, b.centroid_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             $centCos DESC, b.centroid_id) AS rn
         |    FROM embeddings a CROSS JOIN cent b)
         |  WHERE rn = 1),
         |hits AS (
         |  SELECT s.probe_id, c.vec_id AS neighbor_id,
         |         round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |           AS cos_sim
         |  FROM assign s
         |  JOIN corp c ON c.centroid_id = s.best_c
         |             AND c.vec_id <> s.probe_id
         |  JOIN embeddings a ON a.vec_id = s.probe_id
         |  JOIN embeddings b ON b.vec_id = c.vec_id)
         |SELECT probe_id, neighbor_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |            ORDER BY cos_sim DESC, neighbor_id) AS rn FROM hits)
         |WHERE rn <= 5 ORDER BY probe_id, rn"""
    }) { (s, dir) =>
      val e = emb(s, dir).cache()
      val cent = Similarity
        .trainCentroids(e, "vec_id", "embedding", k = 4, iters = 1)
        .select(col("centroid_id"),
          transform(col("vec"), v => round(v, 6)).as("vec"))
        .localCheckpoint()
      val corpusAssigned = Similarity
        .assignToCentroids(e, cent, "vec_id", "embedding")
        .select("vec_id", "embedding", "centroid_id")
      // probe batch is ABSOLUTELY bounded (%100 sample capped at
      // vec_id < 100000, mirrored in the oracle): a relative sample
      // makes probes grow with the corpus and the search join's
      // candidate volume O(N^2/(100k)) — IvfStageProbe measured that
      // term at 95 of 102 s in the round-12 100x spot. A bounded
      // request batch against a growing corpus is the serving shape;
      // per-probe cost still scales with the inverted-list length.
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 &&
          col("vec_id") < 100000)
        .select(col("vec_id"), col("embedding"))
      Similarity.ivfTopK(probes, corpusAssigned, cent,
          "vec_id", "embedding", k = 5)
        .select(col("probe_id"), col("neighbor_id"), col("cos_sim"))
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))
    },

    // Measured ANN recall: per probe, the fraction of the exact top-5
    // that the label-seeded nprobe=1 IVF list captured — the quality
    // gauge for the recall-vs-cost dial, oracle-checked so the metric
    // itself is trustworthy (both top-k sets re-derived in SQL). The
    // join is top-k-frame sized, independent of corpus size. On this
    // fixture the measured recall is ~0-0.2: the synthetic embeddings
    // are near-orthogonal random vectors, so label partitions do not
    // correlate with cosine proximity and single-list IVF misses almost
    // everything — the honest number, and exactly the cliff nprobe>1 /
    // trained centroids exist to climb (SimilarityLibSpec pins recall
    // 1.0 for the trained quantizer on planted clusters).
    q("x_ann_recall",
      s"""WITH exact5 AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.vec_id) AS rn
         |    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn <= 5),
         |cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS best_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |ivf5 AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT s.probe_id, b.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY s.probe_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.vec_id) AS rn
         |    FROM assign s
         |    JOIN embeddings a ON a.vec_id = s.probe_id
         |    JOIN embeddings b ON b.label = s.best_label
         |                     AND b.vec_id <> s.probe_id)
         |  WHERE rn <= 5)
         |SELECT e.probe_id,
         |       count(i.neighbor_id) AS hits,
         |       count(*) AS n_true,
         |       CAST(round(CAST(count(i.neighbor_id) AS DOUBLE)
         |                  / count(*), 4) AS DOUBLE) AS recall
         |FROM exact5 e
         |LEFT JOIN ivf5 i ON i.probe_id = e.probe_id
         |                AND i.neighbor_id = e.neighbor_id
         |GROUP BY e.probe_id
         |ORDER BY e.probe_id""") { (s, dir) =>
      val e = emb(s, dir).cache()
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id"), col("embedding"))
      val exact = Similarity.topK(probes, e, "vec_id", "embedding", k = 5)
      val cent = labelSeededCentroids(e)
      val corpusAssigned = e.select(col("vec_id"), col("embedding"),
        col("label").as("centroid_id"))
      val ann = Similarity.ivfTopK(probes, corpusAssigned, cent,
        "vec_id", "embedding", k = 5)
      Similarity.recallAtK(ann, exact).orderBy("probe_id")
    },

    // The same recall gauge over a PLANTED-cluster corpus: x_ann_recall
    // above is the honest near-zero on random vectors; this row is the
    // structured-data counterpart (SimilarityLibSpec's planted fixture,
    // promoted to the oracled/benched path) proving the gauge itself
    // climbs to ~1.0 when cosine structure exists for IVF to exploit.
    // The corpus is derived from vec_id alone — cluster c = vec_id % 8
    // owns dims [8c, 8c+8) at weight 8, plus an integer-lattice jitter
    // ((vec_id*31 + d*7) % 200 - 100)/500 — so both engines rebuild
    // byte-identical doubles (integer ops + one correctly-rounded
    // division; no RNG, no float-sum ambiguity).
    q("x_ann_recall_planted", {
      val planted =
        """planted AS (
          |  SELECT vec_id,
          |         list_transform(range(0, 64), d ->
          |           CAST(CASE WHEN d >= (vec_id % 8) * 8
          |                      AND d <  ((vec_id % 8) + 1) * 8
          |                     THEN 8 ELSE 0 END AS DOUBLE)
          |           + CAST((vec_id * 31 + d * 7) % 200 - 100 AS DOUBLE)
          |             / CAST(500 AS DOUBLE)) AS embedding,
          |         vec_id % 8 AS label
          |  FROM embeddings)""".stripMargin
      s"""WITH $planted,
         |exact5 AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.vec_id) AS rn
         |    FROM planted a JOIN planted b ON a.vec_id <> b.vec_id
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn <= 5),
         |cent AS (
         |  SELECT e.label, e.embedding FROM planted e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM planted GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |assign AS (
         |  SELECT vec_id AS probe_id, label AS best_label FROM (
         |    SELECT a.vec_id, b.label,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM planted a, cent b
         |    WHERE a.vec_id % 100 = 0 AND a.vec_id < 100000)
         |  WHERE rn = 1),
         |ivf5 AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT s.probe_id, b.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY s.probe_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.vec_id) AS rn
         |    FROM assign s
         |    JOIN planted a ON a.vec_id = s.probe_id
         |    JOIN planted b ON b.label = s.best_label
         |                  AND b.vec_id <> s.probe_id)
         |  WHERE rn <= 5)
         |SELECT e.probe_id,
         |       count(i.neighbor_id) AS hits,
         |       count(*) AS n_true,
         |       CAST(round(CAST(count(i.neighbor_id) AS DOUBLE)
         |                  / count(*), 4) AS DOUBLE) AS recall
         |FROM exact5 e
         |LEFT JOIN ivf5 i ON i.probe_id = e.probe_id
         |                AND i.neighbor_id = e.neighbor_id
         |GROUP BY e.probe_id
         |ORDER BY e.probe_id"""
    }) { (s, dir) =>
      val e = SimilarityQueries.plantedCorpus(emb(s, dir)).cache()
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 100000)
        .select(col("vec_id"), col("embedding"))
      val exact = Similarity.topK(probes, e, "vec_id", "embedding", k = 5)
      val cent = labelSeededCentroids(e)
      val corpusAssigned = e.select(col("vec_id"), col("embedding"),
        col("label").as("centroid_id"))
      val ann = Similarity.ivfTopK(probes, corpusAssigned, cent,
        "vec_id", "embedding", k = 5)
      Similarity.recallAtK(ann, exact).orderBy("probe_id")
    },

    // SemDeDup semantic dedup (Abbas et al. 2023): cluster-then-local
    // pairwise — a row is removed when some LOWER-id member of its
    // cluster is cosine-similar above the threshold (the triangular
    // max-over-priors rule of the public reference implementation).
    // Clusters here are the label-seeded coarse quantizer (the
    // x_ann_ivf shortcut; x_ann_ivf_trained oracles the trained path),
    // so the pairwise stage is an equi-join on centroid_id — Σ|c|²
    // candidate pairs, never corpus × corpus. Threshold 0.35 sits
    // between the synthetic corpus's p99 (~0.29) and max (~0.51)
    // within-cluster cosine, so both verdicts appear in the output.
    //
    // LABELED EXACT FORM — retained by decision (round 12): faithful
    // SemDeDup assumes the quantizer's k grows with N so clusters stay
    // bounded; under a fixed k (as in the stride-cloned scale
    // rehearsal, where every clone of a vector lands in one cluster)
    // the pair stage is quadratic by construction. Unlike the
    // x_ngram_jaccard case there is no exact sub-quadratic
    // reformulation: the max-over-priors rule inspects genuine
    // within-cluster pairs, so the choices are (a) grow k with N —
    // a quantizer policy, not an operator change — or (b) the prefix
    // anchors of the _capped twin below, which IS the library path.
    // This form stays as the oracled exact-semantics gate; it is not
    // among the 10× rehearsal's slowest rows, so the label documents
    // the asymptote rather than a measured hotspot.
    q("x_semantic_dedup",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |corp AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT a.vec_id, b.label AS centroid_id, a.embedding,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a CROSS JOIN cent b)
         |  WHERE rn = 1),
         |mp AS (
         |  SELECT a.vec_id,
         |         max(round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6))
         |           AS max_prior_cos
         |  FROM corp a JOIN corp b ON a.centroid_id = b.centroid_id
         |                         AND b.vec_id < a.vec_id
         |  GROUP BY a.vec_id)
         |SELECT c.vec_id, c.centroid_id, m.max_prior_cos,
         |       (m.max_prior_cos IS NULL OR m.max_prior_cos < 0.35) AS kept
         |FROM corp c LEFT JOIN mp m USING (vec_id)
         |ORDER BY vec_id""") { (s, dir) =>
      val e = emb(s, dir)
      val cent = labelSeededCentroids(e)
      Similarity.semanticDedup(e, cent, "vec_id", "embedding",
          threshold = 0.35)
        .orderBy("vec_id")
    },

    // The flood-safe SemDeDup form: each member compares only against
    // its cluster's 20 LOWEST-id members (prefix anchors), so pair
    // volume is |c|·20 — linear in cluster size — instead of |c|².
    // What the cap can miss is a dup pair wholly inside a cluster's
    // tail; on duplication-flooded corpora (where fixed-k clusters
    // balloon) the flood members all match the earliest arrivals, which
    // the prefix always covers. Same output contract as the exact twin.
    q("x_semantic_dedup_capped",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |corp AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT a.vec_id, b.label AS centroid_id, a.embedding,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a CROSS JOIN cent b)
         |  WHERE rn = 1),
         |pri AS (
         |  -- zero-norm vectors are never priors (library contract), so
         |  -- they must not occupy prefix slots either
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT *, row_number() OVER (PARTITION BY centroid_id
         |              ORDER BY vec_id) AS prn
         |    FROM corp
         |    WHERE list_sum(list_transform(embedding,
         |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0)
         |  WHERE prn <= 20),
         |mp AS (
         |  SELECT a.vec_id,
         |         max(round($dotSql /
         |           (sqrt(list_sum(list_transform(a.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |            sqrt(list_sum(list_transform(b.embedding,
         |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6))
         |           AS max_prior_cos
         |  FROM corp a JOIN pri b ON a.centroid_id = b.centroid_id
         |                        AND b.vec_id < a.vec_id
         |  GROUP BY a.vec_id)
         |SELECT c.vec_id, c.centroid_id, m.max_prior_cos,
         |       (m.max_prior_cos IS NULL OR m.max_prior_cos < 0.35) AS kept
         |FROM corp c LEFT JOIN mp m USING (vec_id)
         |ORDER BY vec_id""") { (s, dir) =>
      val e = emb(s, dir)
      val cent = labelSeededCentroids(e)
      Similarity.semanticDedup(e, cent, "vec_id", "embedding",
          threshold = 0.35, maxPriors = Some(20))
        .orderBy("vec_id")
    },

    // Incremental SemDeDup admission (the embedding twin of
    // x_incremental_dedup): arrivals (vec_id % 10 = 7) are decided
    // against the persisted cluster-prefix anchor index of the already
    // admitted corpus (first 20 per cluster) plus lower-id batch-mates
    // in the same cluster. The admitted corpus's embeddings are never
    // re-read — index cost is ≤ k·20 anchor rows — and the batch side
    // is bounded by the micro-batch contract.
    q("x_incremental_semdedup",
      s"""WITH cent AS (
         |  SELECT e.label, e.embedding FROM embeddings e
         |  JOIN (SELECT label, min(vec_id) AS mv FROM embeddings
         |        WHERE vec_id % 10 <> 7 GROUP BY label) m
         |    ON e.label = m.label AND e.vec_id = m.mv),
         |corp AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT a.vec_id, b.label AS centroid_id, a.embedding,
         |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |             round($dotSql /
         |               (sqrt(list_sum(list_transform(a.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |                sqrt(list_sum(list_transform(b.embedding,
         |                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |             DESC, b.label) AS rn
         |    FROM embeddings a CROSS JOIN cent b)
         |  WHERE rn = 1),
         |ix AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT *, row_number() OVER (PARTITION BY centroid_id
         |              ORDER BY vec_id) AS prn
         |    FROM corp WHERE vec_id % 10 <> 7)
         |  WHERE prn <= 20),
         |del AS (SELECT * FROM corp WHERE vec_id % 10 = 7),
         |di AS (
         |  SELECT DISTINCT a.vec_id FROM del a
         |  JOIN ix b ON a.centroid_id = b.centroid_id
         |  WHERE round($dotSql /
         |          (sqrt(list_sum(list_transform(a.embedding,
         |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |           sqrt(list_sum(list_transform(b.embedding,
         |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |        >= 0.35),
         |dd AS (
         |  SELECT DISTINCT a.vec_id FROM del a
         |  JOIN del b ON a.centroid_id = b.centroid_id
         |            AND b.vec_id < a.vec_id
         |  WHERE round($dotSql /
         |          (sqrt(list_sum(list_transform(a.embedding,
         |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |           sqrt(list_sum(list_transform(b.embedding,
         |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
         |        >= 0.35)
         |SELECT d.vec_id, d.centroid_id,
         |       (di.vec_id IS NOT NULL) AS dup_of_index,
         |       (dd.vec_id IS NOT NULL) AS dup_of_delta,
         |       (di.vec_id IS NULL AND dd.vec_id IS NULL) AS keep
         |FROM del d
         |LEFT JOIN di ON d.vec_id = di.vec_id
         |LEFT JOIN dd ON d.vec_id = dd.vec_id
         |ORDER BY d.vec_id""") { (s, dir) =>
      val e = emb(s, dir)
      val ixsrc = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
      val delta = e.filter(pmod(col("vec_id"), lit(10)) === 7)
      val cent = labelSeededCentroids(e, seedSrc = Some(ixsrc))
      val w = Window.partitionBy("centroid_id").orderBy(col("vec_id"))
      val index = Similarity
        .assignToCentroids(ixsrc, cent, "vec_id", "embedding")
        .withColumn("_prn", row_number().over(w))
        .filter(col("_prn") <= 20)
        .select("vec_id", "embedding", "centroid_id")
      val (decisions, _) = Similarity.incrementalSemanticDedup(
        delta, index, cent, "vec_id", "embedding",
        threshold = 0.35, maxPriors = 20)
      decisions.orderBy("vec_id")
    },
  )

  /** Deterministic planted-cluster corpus, derived from `vec_id` alone
    * so Spark and the oracle rebuild identical doubles: cluster
    * c = vec_id % 8 owns dims [8c, 8c+8) at center weight 8.0; every
    * dim carries jitter ((vec_id*31 + d*7) % 200 - 100)/500.0 in
    * [-0.2, 0.198]. Integer lattice + one IEEE division — no RNG.
    * Columns: (vec_id, embedding: array<double>, label: long). */
  def plantedCorpus(ids: DataFrame): DataFrame = {
    val c = pmod(col("vec_id"), lit(8L))
    ids.select(col("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        when(d >= c * 8 && d < (c + lit(1)) * 8, lit(8.0)).otherwise(lit(0.0))
          + (pmod(col("vec_id") * 31 + d * 7, lit(200L)) - lit(100L))
            / lit(500.0)).as("embedding"),
      c.as("label"))
  }
}
