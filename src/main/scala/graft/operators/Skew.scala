package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skew-handling primitives (SURVEY §7.3 risk (e): hot purl groups like
  * the npm namespace dominate a partition at 100 TB).
  *
  * AQE's skew-join split covers joins; these cover the two shapes AQE does
  * not: skewed aggregation keys and skewed window partitions.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like aggregates over a skewed
    * key. Phase 1 aggregates on (key, salt) — spreading a hot key over
    * `salts` reducers — phase 2 merges the partials per key. Exact for
    * decomposable aggregates. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    withSalt(df, "_salt", salts) // the ONE salting formula (see withSalt)
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy("key")
      .agg(sum("_partial").as("cnt"))

  /** Salted distinct-count: exact countDistinct over a skewed group key.
    * Salt by the VALUE being counted (same value → same salt, so phase-1
    * distinct is globally correct), then sum per-salt distinct counts. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(abs(hash(value)), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(countDistinct(value).as("_partial"))
      .groupBy("key")
      .agg(sum("_partial").as("distinct_cnt"))

  /** Scale-safe global row numbering (the W7 alternative): a global
    * `row_number() over (order by ...)` is a single-partition sort, so at
    * scale we range-partition by the order key, sort within partitions,
    * and add per-partition offsets — identical output, no single-task
    * bottleneck. */
  def globalRowNumber(df: DataFrame, order: Column, numPartitions: Int = 32,
      outCol: String = "row_number"): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // localCheckpoint for the same reason globalRunningSum documents:
    // zipWithIndex runs a partition-size count job and then the data
    // job, and BOTH must see identical partition contents — a lineage
    // replay (shuffle-block loss, executor decommission) between the
    // two passes could shift range boundaries and duplicate or skip
    // row numbers. Also keeps downstream actions from re-sorting.
    val sorted = df.repartitionByRange(numPartitions, order)
      .sortWithinPartitions(order)
      .localCheckpoint()
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(indexed,
      StructType(sorted.schema.fields :+ StructField(outCol, LongType)))
  }

  /** Salt-replicated inner equi-join — the skew-join shape for a hot
    * fact-side key when the dimension side is too large to broadcast
    * but cheap to replicate a handful of times. A plain shuffle join
    * funnels every fact row of a hot key through ONE reducer; here the
    * fact side gets a per-row salt in [0, salts) and the dimension side
    * is exploded once per salt value, so the join key becomes
    * (key, salt) and a hot key's rows spread over `salts` reducers.
    *
    * Exact for any key multiplicity: a fact row carries exactly one
    * salt, and the dimension row for its key exists at every salt, so
    * each (fact row, dim row) pair joins exactly once. Cost model: the
    * dim side shuffles `salts`× its size — pick salts ~ (hot-key rows /
    * target partition rows), not hundreds. AQE's skew split covers sort
    * -merge joins after the fact; this shape also pre-empts the straggler
    * for first-pass shuffles and works under any join strategy.
    *
    * The salt derives from (partition id, row position) — deterministic
    * for a given scan order and uniform regardless of key skew. Nothing
    * about the RESULT depends on which salt a row lands on. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = "_graft_salt"
    require(!fact.columns.contains(saltCol) && !dim.columns.contains(saltCol),
      s"inputs must not already carry $saltCol")
    val replicated = dim.withColumn(saltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    withSalt(fact, saltCol, salts)
      .join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Uniform per-row salt in [0, salts) from (partition id, row
    * position): deterministic for a given scan order, uniform regardless
    * of how skewed any key column is (it never looks at the data). The
    * building block under [[saltedJoin]] and [[saltedCount]]. */
  def withSalt(df: DataFrame, saltCol: String, salts: Int): DataFrame =
    df.withColumn(saltCol,
      pmod(spark_partition_id().cast("long") +
        monotonically_increasing_id(), lit(salts.toLong)))

  /** Scale-safe global running sum (the prefix-sum sibling of
    * [[globalRowNumber]]): a global `sum(...) over (order by ...)` is a
    * single-partition sort, so instead range-partition by the order key,
    * prefix-sum within partitions, and add per-partition offsets —
    * identical output, no single-task bottleneck. The offsets pass
    * collects one long per partition (bounded by the partition count,
    * not the data). Ties in `order` must not exist (use a total order)
    * or the within-tie accumulation order is partition-placement
    * dependent. */
  def globalRunningSum(df: DataFrame, order: Column, value: Column,
      numPartitions: Int = 32, outCol: String = "running_sum"): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // localCheckpoint (eager), not cache(): the two passes (offsets,
    // output) must see identical partition contents, and a cache()d RDD
    // held here would sit in getPersistentRDDs for the session's
    // lifetime — library callers accumulated blocks call after call.
    // Checkpoint blocks are lineage-free (no eviction/recompute window)
    // and are reclaimed as soon as this frame is unreachable.
    val sorted = df.withColumn("_rsv", value.cast("long"))
      .repartitionByRange(numPartitions, order)
      .sortWithinPartitions(order)
      .localCheckpoint()
    val valueIdx = sorted.schema.fieldIndex("_rsv")
    val rdd = sorted.rdd
    val perPart = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single(i -> it.map(_.getLong(valueIdx)).sum)
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, i) => acc + perPart.getOrElse(i, 0L)).toArray
    val summed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        acc += row.getLong(valueIdx)
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq.patch(valueIdx, Nil, 1) :+ acc)
      }
    }
    val schema = StructType(
      sorted.schema.fields.patch(valueIdx, Nil, 1) :+
        StructField(outCol, LongType))
    spark.createDataFrame(summed, schema)
  }

  /** Skew-safe global top-k per key, two stages: stage 1 windows over
    * (key, input partition id) — a full exchange, but one where a hot
    * key stays SPREAD over its input partitions instead of funneling
    * into a single reducer (the salting pattern, with the physical
    * partition id as the salt) — and prunes to ≤ k rows per (key, pid);
    * stage 2's per-key window then never sees more than partitions×k
    * rows for any key. The win over a naive single window is not fewer
    * shuffles, it is that no single task ever receives a hot key's full
    * row set. */
  def topKPerKey(df: DataFrame, key: Column, order: Column, k: Int,
      asc: Boolean = false): DataFrame = {
    // `asc` takes the k SMALLEST per key — usable with any orderable
    // column type (negating the order column would pin this to numerics)
    val ord = if (asc) order.asc else order.desc
    val byKey = Window.partitionBy(key, spark_partition_id())
      .orderBy(ord)
    val local = df.withColumn("_lrn", row_number().over(byKey))
      .filter(col("_lrn") <= k).drop("_lrn")
    val global = Window.partitionBy(key).orderBy(ord)
    local.withColumn("_grn", row_number().over(global))
      .filter(col("_grn") <= k)
      .withColumnRenamed("_grn", "rank")
  }
}
