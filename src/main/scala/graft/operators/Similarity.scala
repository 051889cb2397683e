package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Library API for embedding similarity search (the parameterized form of
  * SimilarityQueries): brute-force top-k for bounded probe sets and the
  * IVF partition path for corpus-scale search.
  */
object Similarity {

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("_pv"))
      .withColumn("_pn", l2Norm(col("_pv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", l2Norm(col("_cv")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(p).join(c, col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("_pv"), col("_cv")) / (col("_pn") * col("_cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos_sim", "rank")
  }

  /** IVF assignment: nearest centroid per row → partition key. Centroids
    * must be small (broadcast): (centroid_id, vec). */
  def assignToCentroids(df: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val c = centroids.select(col("centroid_id"), col("vec").as("_cent"))
      .withColumn("_centn", l2Norm(col("_cent")))
    val w = Window.partitionBy(idCol).orderBy(col("_ccos").desc,
      col("centroid_id"))
    df.withColumn("_vn", l2Norm(col(vecCol)))
      .crossJoin(broadcast(c))
      .withColumn("_ccos", round(dot(col(vecCol), col("_cent")) /
        (col("_vn") * col("_centn")), 6))
      .withColumn("_crn", row_number().over(w))
      .filter(col("_crn") === 1)
      .drop("_cent", "_centn", "_vn", "_ccos", "_crn")
  }

  /** IVF top-k: probes search only their assigned centroid's partition —
    * the similarity join becomes an equi-join on centroid_id. */
  def ivfTopK(probes: DataFrame, corpusAssigned: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val assignedProbes = assignToCentroids(probes, centroids, idCol, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("_pv"),
        col("centroid_id"))
      .withColumn("_pn", l2Norm(col("_pv")))
    val c = corpusAssigned.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"), col("centroid_id"))
      .withColumn("_cn", l2Norm(col("_cv")))
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
}
