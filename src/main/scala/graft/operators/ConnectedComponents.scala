package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components + in-partition union-find.
  *
  * Re-expresses the reference's advisory-grouping (SURVEY D2):
  * pipes/group_advisories.py:182-245 replaces an O(n²) merge with a
  * union-find over advisories sharing an advisory_id or alias.
  *
  * Two paths, mirroring the reference's own two-level design:
  *  1. `labelPropagation` — global iterative min-label propagation over an
  *     edge DataFrame. Each round is one shuffle (join + groupBy-min);
  *     rounds ≈ graph diameter. Advisory/alias graphs are hub-shaped
  *     (small diameter), so this converges in a handful of rounds at any
  *     scale. Early-stops when no label changes.
  *  2. `dsu` — plain Scala union-find for use INSIDE a group
  *     (`groupByKey.mapGroups`), after D3 content-hash pre-bucketing has
  *     made each group small (pipes/group_advisories.py:248-285). No
  *     shuffle beyond the bucketing groupBy.
  */
object ConnectedComponents {

  /** Global CC by min-label propagation.
    * @param edges DataFrame with long columns (src, dst); undirected.
    * @return DataFrame (node: Long, component: Long) — component is the
    *         minimum node id reachable.
    */
  /** @param finishThreshold override of [[LocalFinishThreshold]] (specs
    *        force 0 to exercise the distributed loop on small graphs) */
  def labelPropagation(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 20,
      finishThreshold: Long = LocalFinishThreshold): DataFrame = {
    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
    // One materialization decides the path AND feeds whichever path runs
    // (the earlier two-count shape — count edges for sizing, count
    // distinct for the fast-path test — scanned the input twice).
    val dist = sym.distinct().localCheckpoint()
    val nDistinct = dist.count()
    // Round-0 fast path: when the whole graph already fits the bounded
    // driver finish (same 16-bytes-per-edge bound as tryLocalFinish),
    // skip the distributed rounds entirely — 4+ label-prop jobs cost far
    // more than one small collect. Past the threshold the iterative
    // contract-then-finish hybrid below is unchanged; the 100 TB path
    // never takes this branch.
    if (nDistinct <= 2L * finishThreshold) {
      import spark.implicits._
      val pairs = dist.filter(col("src") < col("dst"))
        .as[(Long, Long)].collect()
      val roots = dsuEdges(pairs)
      val rootsDf = roots.toSeq.toDF("node", "root")
      return dist.select(col("src").as("node")).distinct()
        .join(broadcast(rootsDf), Seq("node"), "left")
        .select(col("node"), coalesce(col("root"), col("node"))
          .as("component"))
    }
    // Size the iteration's parallelism to the graph AND the runtime:
    // ~256k edges per partition so each round's join tasks stay
    // CPU-bound, floored at the cluster's core count — this path only
    // runs past the fast-path bound (≥400k edges), where fewer
    // partitions than cores would serialize the rounds (measured: the
    // old 1M-edges/partition sizing ran a 6M-edge rehearsal on 4
    // partitions of a 32-core runtime).
    val nPart = math.max(spark.sparkContext.defaultParallelism,
      math.min(8192, (nDistinct / 262144L).toInt + 1))
    // adjacency is reused every round — cache the repartitioned form
    val adj = dist.repartition(nPart, col("dst")).cache()
    val sq = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", nPart)
    try labelPropagationLoop(spark, adj, maxIter, finishThreshold)
    finally sq.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
  }

  /** Contracted-graph edge count below which the remainder is solved with
    * the in-partition DSU on the driver (the contracted graph after one
    * round is component-level — orders of magnitude smaller than the
    * input; iterate distributed rounds until it fits, then finish).
    *
    * MEMORY BOUND: the collected rows are exactly two longs each (the
    * contract projects to (c_src, c_dst) before the count guard), so the
    * driver holds ≤ threshold × 16 bytes = 16 MB of payload plus tuple
    * overhead — a fixed bound that cannot widen if upstream edge rows
    * grow columns, and far under any driver's result-size budget.
    * Measured at the 10× rehearsal: a 1.1M-edge graph costs ~18 s of
    * distributed rounds vs ~3 s collected, so the crossover sits well
    * above this bound — billions-of-edges graphs (the real 100 TB case)
    * still run the iterative contract-then-finish path.
    * `tryLocalFinish` asserts the two-column shape so any future schema
    * change fails fast instead of silently inflating the collect. */
  private val LocalFinishThreshold = 1000000L

  /** Contract edges to component level and, if small, finish locally:
    * returns Some(component → root) mapping DataFrame. */
  private def tryLocalFinish(spark: SparkSession, adj: DataFrame,
      labels: DataFrame, finishThreshold: Long): Option[DataFrame] = {
    import spark.implicits._
    val compEdges = adj
      .join(labels.select(col("node"), col("component").as("c_src")),
        col("src") === col("node"))
      .drop("node")
      .join(labels.select(col("node"), col("component").as("c_dst")),
        col("dst") === col("node"))
      .select(col("c_src"), col("c_dst"))
      .filter(col("c_src") =!= col("c_dst"))
      .distinct()
      .localCheckpoint()
    // the collect below is bounded: ≤ LocalFinishThreshold rows of exactly
    // two long columns (see threshold scaladoc)
    assert(compEdges.schema.fields.length == 2 &&
      compEdges.schema.fields.forall(
        _.dataType == org.apache.spark.sql.types.LongType),
      s"local-finish expects (long, long) component edges, " +
        s"got ${compEdges.schema.simpleString}")
    if (compEdges.count() > finishThreshold) None
    else {
      val pairs = compEdges.as[(Long, Long)].collect()
      val roots = dsuEdges(pairs)
      Some(roots.toSeq.toDF("component", "root"))
    }
  }

  /** Plain union-find over explicit edges. */
  def dsuEdges(pairs: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent.getOrElse(c, c); parent(c) = r; c = n
      }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def labelPropagationLoop(spark: SparkSession, adj: DataFrame,
      maxIter: Int, finishThreshold: Long): DataFrame = {
    // localCheckpoint truncates lineage each round — without it the plan
    // deepens every iteration and the driver OOMs compiling it
    var labels = adj.groupBy(col("src").as("node"))
      .agg(min("dst").as("m"))
      .select(col("node"), least(col("m"), col("node")).as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // hybrid finish: once the contracted component graph is small, solve
      // the remainder on the driver and map labels through the result
      tryLocalFinish(spark, adj, labels, finishThreshold) match {
        case Some(mapping) =>
          val done = labels
            .join(broadcast(mapping), Seq("component"), "left")
            .select(col("node"),
              least(coalesce(col("root"), col("component")), col("component"))
                .as("component"))
          adj.unpersist()
          return done
        case None => ()
      }
      // 1) neighbor-min: component(n) <- min over neighbors m of component(m)
      val viaNeighbors = adj
        .join(labels.withColumnRenamed("node", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("node"))
        .agg(min("component").as("nbr_component"))
      val stepped = labels.withColumnRenamed("component", "old")
        .join(viaNeighbors, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("nbr_component"), col("old")))
            .as("component"))
      // 2) pointer jump: component(n) <- component(component(n)). On
      //    hub-shaped graphs neighbor-min already spreads through hubs, so
      //    one jump is kept for chain-shaped regions; measured on the
      //    bench graph more jumps add joins without cutting rounds.
      val to = stepped.select(col("node").as("j_node"),
        col("component").as("j_component"))
      val next = stepped
        .join(to, col("component") === col("j_node"), "left")
        .select(col("node"), col("old"),
          least(col("component"),
            coalesce(col("j_component"), col("component"))).as("component"))
        .localCheckpoint()
      labels = next.select("node", "component")
      iter += 1
      // convergence probe every other round (each probe is one more job)
      if (iter % 2 == 0 || iter >= maxIter) {
        val changed = next.filter(col("component") < col("old")).limit(1).count()
        converged = changed == 0
      }
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"[cc] iteration $iter converged=$converged")
    }
    adj.unpersist()
    labels
  }

  /** In-partition union-find over (id, keys) members: ids sharing any key
    * are grouped. Returns id → root (min id of its group). Use inside
    * mapGroups after content-hash bucketing keeps groups small. */
  def dsu(members: Seq[(Long, Seq[String])]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent.getOrElse(c, c); parent(c) = r; c = n
      }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    members.foreach { case (id, _) => parent.getOrElseUpdate(id, id) }
    val byKey = scala.collection.mutable.Map[String, Long]()
    members.foreach { case (id, keys) =>
      keys.foreach { k =>
        byKey.get(k) match {
          case Some(other) => union(id, other)
          case None        => byKey(k) = id
        }
      }
    }
    members.map { case (id, _) => id -> find(id) }.toMap
  }
}
