package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit for the engine's scale contracts, asserted against
  * parquet-backed scans (in-memory relations would be collapsed by
  * ConvertToLocalRelation and prove nothing):
  *  - scans prune columns and push filters;
  *  - the dedup library's candidate generation never degrades to a
  *    cross product / nested-loop join — every candidate join is an
  *    equi-join on a bucket key;
  *  - survivor selection partial-aggregates (map-side combine) instead
  *    of window-sorting the corpus.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    p +: inner.flatMap(allNodes)
  }

  private lazy val docsDir: String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("planaudit").toString
    (0 until 200).map { i =>
      (i.toLong, s"w${i % 7} w${i % 13} w${i % 5} w${i % 3} w${i % 11}",
        if (i % 2 == 0) "en" else "fr", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def docs: DataFrame = spark.read.parquet(docsDir)

  test("parquet scan prunes columns and pushes filters") {
    val df = docs.filter(col("lang") === "en").select("doc_id")
    df.collect()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("EqualTo(lang,en)"),
      s"filter not pushed: ${meta("PushedFilters")}")
    // projection reaches the scan: only the filter + output columns read
    assert(scans.head.schema.fieldNames.toSet == Set("doc_id", "lang"),
      s"scan reads ${scans.head.schema.fieldNames.mkString(",")}")
  }

  test("dedup candidate joins never degrade to cross products") {
    val cases: Seq[(String, DataFrame)] = Seq(
      "ngramJaccardPairs" ->
        TextDedup.ngramJaccardPairs(docs, "text", "doc_id",
          n = 2, threshold = 0.1, maxDf = 50),
      "minHashLshPairs" ->
        TextDedup.minHashLshPairs(docs, "text", "doc_id",
          numHashes = 16, bands = 4, threshold = 0.1, maxBucketSize = 50),
      "simHashPairs" ->
        TextDedup.simHashPairs(docs, "text", "doc_id",
          bits = 16, bands = 4, maxHamming = 2, maxBucketSize = 50),
      "ngramJaccardPairsPrefix" ->
        TextDedup.ngramJaccardPairsPrefix(
          TextDedup.shingles(docs, "text", "doc_id", 2), "id", "shingle",
          threshold = 0.5),
      "minHashLshPairsCollapsed" ->
        TextDedup.minHashLshPairsCollapsed(docs, "text", "doc_id",
          numHashes = 16, bands = 4, threshold = 0.1, maxBucketSize = 50))
    cases.foreach { case (name, df) =>
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      val bad = nodes.filter(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
      assert(bad.isEmpty,
        s"$name plan contains a non-equi join: ${bad.map(_.nodeName)}")
      val hasEquiJoin = nodes.exists(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
      assert(hasEquiJoin, s"$name should candidate-join on a bucket key")
    }
  }

  test("contamination broadcasts the benchmark vocabulary (one pass)") {
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val df = Corpus.contamination(corpus, bench, "text", "doc_id", n = 2)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val bcast = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
    }
    assert(bcast.nonEmpty,
      "membership test must be a broadcast left-outer tag join — the " +
        "corpus side must never shuffle for it")
    // single-pass: one aggregation pair (partial+final) over the corpus
    // shingles plus one pair for the bounded vocab distinct = 4 nodes;
    // the semi-then-rejoin shape carried 6 (two corpus-side pairs)
    val aggs = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])
    assert(aggs <= 4, s"expected at most two aggregate pairs, saw $aggs")
  }

  test("incremental admission candidate joins stay equi-joins too") {
    // the delta-vs-index forms must inherit the batch forms' contract:
    // every candidate join keys on (band, bucket/chunk), never a
    // cross/nested-loop product, however the index side arrives. The
    // returned decisions frame is localCheckpoint'ed INSIDE the library
    // (its own plan is a bare RDD scan), so the candidate joins are
    // captured as they EXECUTE, via a QueryExecutionListener — auditing
    // the returned plan would be vacuous.
    val index = TextDedup.minHashSignatures(
      docs.filter(col("doc_id") % 3 =!= 0), "text", "doc_id")
    val simIndex = TextDedup.simHash(
      docs.filter(col("doc_id") % 3 =!= 0), "text", "doc_id", bits = 16)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = seen.add(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      TextDedup.incrementalMinHashDedup(
        delta, index, "text", "doc_id", numHashes = 16, bands = 4,
        threshold = 0.1, maxBucketSize = 50)
      TextDedup.incrementalSimHashDedup(
        delta, simIndex, "text", "doc_id", bits = 16, bands = 4,
        maxHamming = 2, maxBucketSize = 50)
      // listener delivery is async; wait until the checkpoint
      // executions (which contain the candidate joins) have landed
      def joinNodes = {
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq.flatMap(allNodes).filter(n =>
          n.nodeName.toLowerCase.contains("join"))
      }
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (System.nanoTime < deadline && joinNodes.size < 2)
        Thread.sleep(100)
      val joins = joinNodes
      assert(joins.size >= 2,
        s"expected the captured checkpoint executions to contain the " +
          s"candidate joins, saw ${joins.map(_.nodeName)}")
      val bad = joins.filter(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
      assert(bad.isEmpty,
        s"admission plans contain a non-equi join: ${bad.map(_.nodeName)}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("incrementalContamination broadcasts the persisted vocab index") {
    val vocab = Corpus.benchmarkVocab(
      docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", n = 2)
    val df = Corpus.incrementalContamination(
      docs.filter(col("doc_id") % 10 =!= 0), vocab, "text", "doc_id",
      n = 2)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val bcast = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
    }
    assert(bcast.nonEmpty,
      "arrival batches must never shuffle for the membership test — " +
        "the bounded vocab index broadcasts")
  }

  test("quantile sketch partial-aggregates map-side (mergeable state)") {
    val df = Corpus.qualityQuantiles(docs, "doc_id", "source", Seq(0.5, 0.9))
    df.collect()
    val aggs = allNodes(df.queryExecution.executedPlan).collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.size >= 2,
      s"expected partial+final sketch aggregation, got ${aggs.size}")
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "sketch must accumulate map-side before the shuffle")
  }

  test("keyset pagination pushes the cursor and top-ks, no global sort") {
    // the w6b serving shape: cursor predicate reaches the parquet scan,
    // ORDER BY + LIMIT collapses to TakeOrderedAndProject (per-partition
    // top-k + k-row merge) — never a full SortExec of the table.
    val df = docs
      .filter(col("doc_id") > 50L)
      .select("doc_id", "source")
      .orderBy("doc_id")
      .limit(10)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "keyset page must use TakeOrderedAndProject")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      "keyset page must not global-sort")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    assert(scans.head.metadata("PushedFilters").contains("GreaterThan(doc_id,50)"),
      s"cursor not pushed: ${scans.head.metadata("PushedFilters")}")
  }

  test("content-dedup survivor pick partial-aggregates, no window sort") {
    val df = docs
      .groupBy(sha2(lower(trim(col("text"))), 256).as("content_id"))
      .agg(min("doc_id").as("doc_id"))
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "survivor selection must not window-sort the corpus")
    val aggs = nodes.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    // partial (map-side combine) + final pair around the exchange
    assert(aggs.size >= 2,
      s"expected partial+final aggregation, got ${aggs.size} agg nodes")
  }

  test("vulnerable-purls endpoints semi-join; request side broadcasts") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("planpkg").toString
    (0 until 200).map { i =>
      (s"pkg:npm/p${i % 20}", s"${i % 7}",
        s"pkg:npm/p${i % 20}@${i % 7}", s"pkg:npm/p${i % 20}@${i % 7}")
    }.toDF("base_purl", "version", "package_url", "plain_package_url")
      .distinct().write.mode("overwrite").parquet(dir)
    val pkgs = spark.read.parquet(dir)
    val unfurled = (0 until 300).map { i =>
      (s"adv/${i % 50}", s"pkg:npm/p${i % 20}", s"${i % 7}", i % 3 == 0,
        false)
    }.toDF("avid", "base_purl", "version", "is_affected", "is_fixed")
    val purls = Seq("pkg:npm/p1@1?arch=x", "pkg:npm/p2@3").toDF("purl")
    val cases = Seq(
      "allVulnerablePurls" ->
        graft.serve.Serving.allVulnerablePurls(pkgs, unfurled),
      "vulnerablePlainPurlsOf" ->
        graft.serve.Serving.vulnerablePlainPurlsOf(pkgs, unfurled, purls))
    cases.foreach { case (name, df) =>
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      val bad = nodes.filter(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
      assert(bad.isEmpty, s"$name has a non-equi join: ${bad.map(_.nodeName)}")
      val semis = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, s"$name must semi-join the vulnerable edge")
    }
    // the bounded request list must be the BROADCAST side of its join
    val plain = graft.serve.Serving
      .vulnerablePlainPurlsOf(pkgs, unfurled, purls)
    plain.collect()
    assert(allNodes(plain.queryExecution.executedPlan).exists {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _ => false
    }, "request list must broadcast, never shuffle the package table for it")
  }

  test("hot version-domain plans run codegen'd natives — no ScalaUDF") {
    // VERDICT r12 #1: the unfurl join (the engine's hottest scan) and the
    // improver family must route version containment / sort keys /
    // endpoint extraction through the native Catalyst expressions, not
    // the Scala UDF twins — a UDF there breaks WholeStageCodegen and
    // pays an InternalRow conversion on every row of a 100 TB scan.
    val dir = "/root/testdata/sf0.001"
    val hot = Seq("v2_unfurl", "d16_default_inferences",
      "d17_valid_version_inferences", "d18_vuln_status",
      "d19_nginx_inferences")
    hot.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val udfs = df.queryExecution.optimizedPlan.collect {
        case plan => plan.expressions.flatMap(_.collect {
          case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
        })
      }.flatten
      assert(udfs.isEmpty,
        s"$name plan contains ScalaUDF(s): ${udfs.map(_.udfName).mkString(",")}")
    }
  }

  test("codeFixes claims commits with one partial aggregation, equi-joins") {
    val sp = spark
    import sp.implicits._
    val advisories = (0 until 100).map { i =>
      (s"adv/${i % 25}",
        Seq((s"https://github.com/o/r${i % 5}/commit/${"%08x".format(i % 8)}",
          "advisory", "")),
        true)
    }.toDF("avid", "references", "is_latest")
      .withColumn("references", col("references").cast(
        "array<struct<url:string,reference_type:string,reference_id:string>>"))
    val unfurled = (0 until 300).map { i =>
      (s"adv/${i % 25}", s"pkg:npm/p${i % 10}", s"${i % 4}", i % 2 == 0)
    }.toDF("avid", "base_purl", "version", "is_affected")
    val df = graft.derive.AdvisoryDerive.codeFixes(advisories, unfurled)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "codeFixes must stay equi-join only")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec]),
      "first-wins claim must be an aggregation, not a window sort")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "codeFixes must not window-sort the reference corpus")
  }

  test("bm25SearchIndexed top-ks without a global sort and keeps the " +
      "query-term filter ahead of the posting-list aggregation") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    val (p0, l0) = Corpus.bm25IndexDelta(docs, "text", "doc_id")
    p0.write.mode("overwrite").parquet(s"$dir/postings")
    l0.write.mode("overwrite").parquet(s"$dir/doclens")
    val postings = sp.read.parquet(s"$dir/postings")
    val docLens = sp.read.parquet(s"$dir/doclens")
    val df = Corpus.bm25SearchIndexed(postings, docLens, "doc_id",
      "w1 w2", k = 5)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    // ORDER BY score + LIMIT k must collapse to TakeOrderedAndProject
    // (per-partition top-k, k-sized driver merge) — never a global sort
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "indexed search must TakeOrderedAndProject")
    assert(!nodes.exists {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }, "indexed search must not global-sort")
    // the query-term In filter reaches the postings parquet scan, so
    // only |query terms| posting lists are read from the index
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata("Location").contains("postings") => f
    }
    assert(scans.nonEmpty, "expected a postings scan")
    assert(scans.exists(_.metadata("PushedFilters").contains("In(token")),
      s"query-term filter not pushed: " +
        scans.map(_.metadata("PushedFilters")).mkString("; "))
  }

  test("packTokenized co-locates each stream with ONE shuffle — no " +
      "window sort, no global sort, no join; the incremental form " +
      "rides the SAME single shuffle over the state∪delta union") {
    // the operator's packing scan runs as an RDD mapPartitions below
    // the createDataFrame boundary (the returned plan is a bare RDD
    // scan), so — the incrementalSubstringStrip treatment — audit the
    // exact co-location plan the operator builds upstream of it
    val sp = spark
    val proj = docs
      .select(col("doc_id"), col("source").cast("string").as("source"),
        (size(split(col("text"), " ")).cast("long") + 1).as("_k"))
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
    val stateRows = sp.range(3)
      .select(concat(lit("src"), col("id")).as("source"),
        lit(0).as("_tag"), lit(null).cast("long").as("doc_id"),
        col("id").as("_k"))
    // the doc side enters RAW (the operator repartitions the union
    // once — proj's own exchange above would double-shuffle)
    val docSide = docs
      .select(col("source").cast("string").as("source"), lit(1).as("_tag"),
        col("doc_id"), (size(split(col("text"), " ")).cast("long") + 1)
          .as("_k"))
    val combined = stateRows.unionByName(docSide)
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("_tag"), col("doc_id"))
    Seq("batch" -> proj, "incremental" -> combined).foreach {
      case (name, df) =>
        df.collect()
        val nodes = allNodes(df.queryExecution.executedPlan)
        val shuffles = nodes.count(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        assert(shuffles == 1,
          s"$name packing must co-locate with ONE shuffle, saw $shuffles")
        assert(!nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
          s"$name packing must not window-sort the corpus")
        assert(!nodes.exists {
          case s: org.apache.spark.sql.execution.SortExec => s.global
          case _ => false
        }, s"$name packing must sort within partitions only, never globally")
        assert(!nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
          s"$name packing must not join — state unions in, tag-sorted")
    }
    // and the REAL operators produce through that shape: run both on
    // the parquet docs so the audited twin is the executed code path
    val counts = docs.select(col("doc_id"), col("source"),
      (size(split(col("text"), " ")).cast("long")).as("n_tok"))
    assert(Corpus.packTokenized(counts, "doc_id", "source", "n_tok",
      ctxLen = 8).count() > 0)
    val st0 = Corpus.emptyPackState(sp)
    val (pk, st1) = Corpus.incrementalPackTokenized(
      counts, st0, "doc_id", "source", "n_tok", ctxLen = 8)
    assert(pk.count() > 0 && st1.count() == 3)
  }

  test("incrementalSubstringStrip classifies with ONE index join, " +
      "equi-only, no window sort") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sstrip_ix").toString
    Corpus.substringDigestIndex(docs, "text", "doc_id", windowTokens = 3)
      .write.mode("overwrite").parquet(s"$dir/index")
    val index = sp.read.parquet(s"$dir/index")
    // audit the CLASSIFICATION plan (the checkpoint inside the operator
    // hides upstream nodes): the same left join the operator builds
    val winRows = docs
      .select(col("doc_id").as("_id"),
        explode(call_function("rolling_window_digests_native",
          Corpus.tokens(col("text")), lit(3))).as("_c"))
      .select(col("_id"), col("_c.pos").as("_pos"),
        col("_c.h1").as("h1"), col("_c.h2").as("h2"))
    val classed = winRows.join(
      index.select(col("h1"), col("h2"), lit(true).as("_ix")),
      Seq("h1", "h2"), "left")
    classed.collect()
    val nodes = allNodes(classed.queryExecution.executedPlan)
    val joins = nodes.filter(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(joins.size == 1, s"expected ONE index join, got ${joins.size}")
    assert(!nodes.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "classification must stay an equi-join")
    // the full operator: no window sort anywhere (the hot pick is a
    // min-struct aggregation, the rebuild map-only)
    val (res, _) = Corpus.incrementalSubstringStrip(
      docs, index, "text", "doc_id", windowTokens = 3)
    res.collect()
    assert(!allNodes(res.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "admission must not window-sort")
  }
}
