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

  test("brute-force topK ranks by cosine") {
    val probes = vecs.filter(col("id") === 1L)
    val top = Similarity.topK(probes, vecs, "id", "vec", 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq == Seq((2L, 1), (3L, 2)) ||
      top.head == ((2L, 1))) // neighbor 2 must rank first
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
}
