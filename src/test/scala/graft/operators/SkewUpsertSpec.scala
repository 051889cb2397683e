package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.derive.Upserts

class SkewSpec extends AnyFunSuite with SparkTestSession {
  test("salted count matches plain count") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}"))
      .toDF("k")
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted countDistinct matches plain countDistinct") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 2000).map(i => ("hot", s"v${i % 37}")).toDF("k", "v")
      .union((1 to 100).map(i => ("cold", s"v${i % 7}")).toDF("k", "v"))
    val plain = df.groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join matches plain join, including duplicate keys") {
    val sp = spark
    import sp.implicits._
    // hot key 1 on the fact side; dim carries DUPLICATE key rows (2×"b")
    // so the pair-multiplicity contract is exercised, not just 1:N
    val fact = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 50).map(i => (i.toLong % 7 + 2, s"c$i"))).toDF("k", "f")
      .repartition(8)
    val dim = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (99L, "z"))
      .toDF("k", "d")
    val got = Skew.saltedJoin(fact, dim, "k", salts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = fact.join(dim, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.count(_._1 == 1L) == 900)
    assert(got.count(_._1 == 2L) > 0 && got.forall(_._1 != 99L))
  }

  test("salting spreads a single hot key's rows over all salt values") {
    val sp = spark
    import sp.implicits._
    // every row shares ONE key — the worst-case skew; the salt must
    // still cover [0, salts) so the (key, salt) shuffle uses 4 reducers
    val fact = (1 to 4000).map(_ => (1L, "hot")).toDF("k", "f")
      .repartition(8)
    val salts = Skew.withSalt(fact, "_s", 4)
      .groupBy("_s").count().collect()
    assert(salts.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    // and no salt holds a grossly disproportionate share
    assert(salts.map(_.getLong(1)).max <= 4000 * 2 / 4)
  }

  test("global running sum matches the window prefix sum") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i * 7 % 13).toLong))
      .toDF("id", "v").repartition(8)
    val got = Skew.globalRunningSum(df, col("id"), col("v"),
        numPartitions = 5)
      .select("id", "running_sum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    (1 to 1000).foreach { i =>
      acc += i * 7 % 13
      assert(got(i.toLong) == acc, s"id $i")
    }
  }

  test("shard assignment fills shards to the token budget in id order") {
    val sp = spark
    import sp.implicits._
    val docs = (1 to 300)
      .map(i => (i.toLong, Seq.fill(1 + i % 9)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(6)
    val out = Corpus.assignShards(docs, "text", "doc_id",
        tokensPerShard = 50, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    // deterministic, contiguous, budget-respecting: shard ids never
    // decrease in id order, and each doc starts in the shard whose
    // budget window contains its running-sum start
    assert(out.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    var cum = 0L
    out.foreach { case (id, n, shard) =>
      assert(shard == cum / 50, s"doc $id")
      cum += n
    }
    // rerun is identical
    val again = Corpus.assignShards(docs, "text", "doc_id", 50, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(again.toSeq == out.map(t => (t._1, t._3)).toSeq)
  }

  test("two-phase top-k per key matches global window") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 500).map(i => (s"k${i % 5}", i.toDouble)).toDF("k", "v")
      .repartition(8)
    val got = Skew.topKPerKey(df, col("k"), col("v"), 3)
      .select("k", "v").collect().map(r => (r.getString(0), r.getDouble(1)))
      .toSet
    val want = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).toSeq
      .flatMap { case (_, vs) => vs.sortBy(-_._2).take(3) }.toSet
    assert(got == want)
  }
}

class GlobalRowNumberSpec extends AnyFunSuite with SparkTestSession {
  test("range-partitioned global row numbering matches the window form") {
    val sp = spark
    import sp.implicits._
    val df = scala.util.Random.shuffle((1 to 500).toList).toDF("v")
      .repartition(8)
    val got = Skew.globalRowNumber(df, col("v"), numPartitions = 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((1 to 500).forall(v => got(v) == v.toLong))
  }
}

class PipelineRunnerSpec extends AnyFunSuite {
  import graft.derive.Pipeline
  test("steps run in order with timing; failure stops the run (T6)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val log = Pipeline.execute("demo", Seq(
      Pipeline.Step("a")(() => seen += "a"),
      Pipeline.Step("b")(() => { seen += "b"; throw new RuntimeException("boom") }),
      Pipeline.Step("c")(() => seen += "c")))
    assert(seen.toSeq == Seq("a", "b"))
    assert(log.map(_.step) == Seq("a", "b"))
    assert(log.last.exitcode == 1 && log.last.error.contains("boom"))
    assert(log.head.exitcode == 0)
    assert(log.forall(_.pipeline_id == "demo"))
  }
}

class UpsertsSpec extends AnyFunSuite with SparkTestSession {
  test("confidenceMax keeps higher confidence, existing wins ties (models.py:1217-1249)") {
    val sp = spark
    import sp.implicits._
    val existing = Seq(("p1", "v1", 80, "old"), ("p2", "v2", 50, "old"))
      .toDF("pkg", "vuln", "confidence", "who")
    val incoming = Seq(("p1", "v1", 90, "new"), ("p2", "v2", 50, "new"),
      ("p3", "v3", 10, "new")).toDF("pkg", "vuln", "confidence", "who")
    val merged = Upserts.confidenceMax(existing, incoming, Seq("pkg", "vuln"))
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3))).toSet
    assert(merged == Set(("p1", 90, "new"), ("p2", 50, "old"), ("p3", 10, "new")))
  }

  test("insertIgnoreConflicts and updateOrCreate") {
    val sp = spark
    import sp.implicits._
    val existing = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val incoming = Seq(("b", 99), ("c", 3)).toDF("k", "v")
    val ignored = Upserts.insertIgnoreConflicts(existing, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ignored == Map("a" -> 1, "b" -> 2, "c" -> 3))
    val updated = Upserts.updateOrCreate(existing, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(updated == Map("a" -> 1, "b" -> 99, "c" -> 3))
  }

  test("upserts keep ONE row per key even for intra-batch duplicates") {
    val sp = spark
    import sp.implicits._
    val existing = Seq(("a", 1)).toDF("k", "v")
    // the same key arrives twice in one batch (e.g. one commit harvested
    // from two references in the same run)
    val incoming = Seq(("c", 7), ("c", 3), ("a", 9)).toDF("k", "v")
    val ignored = Upserts.insertIgnoreConflicts(existing, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    assert(ignored.length == 2) // one a, ONE c — not two c rows
    assert(ignored.toMap == Map("a" -> 1, "c" -> 3)) // deterministic pick
    val updated = Upserts.updateOrCreate(existing, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    assert(updated.length == 2)
    assert(updated.toMap == Map("a" -> 9, "c" -> 3))
  }
}
