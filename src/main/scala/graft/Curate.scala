package graft

import org.apache.spark.sql.functions._

/** End-to-end curation CLI — the artifact a training-data run actually
  * produces: `documents.parquet` in, a per-doc decision ledger plus a
  * kept/deduped/sharded training corpus out.
  *
  *   runMain graft.Curate <sfDir> <outDir> [tokensPerShard]
  *
  * Output layout:
  *   <outDir>/ledger/          per-doc keep/drop signals (quality, split,
  *                             PII, near-dup, contamination) — audit mart
  *   <outDir>/corpus/          kept docs as hive-partitioned parquet
  *                             split=<s>/shard=<n>/, each shard holding
  *                             ~tokensPerShard tokens of id-ordered docs
  *
  * Every stage is the library's capped scale form: the pipeline is
  * Engine.runCorpusPipeline (broadcast/bounded joins), sharding is the
  * range-partitioned running sum (no global-window sort), and the write
  * is sources.Partitioned (low-cardinality dirs, pruned reads). The
  * per-split driver loop iterates the ≤3 split VALUES, not rows.
  */
object Curate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Curate <sfDir> <outDir> [tokensPerShard]")
    val (inDir, outDir) = (args(0), args(1))
    val budget = args.lift(2).map(_.toLong).getOrElse(100000L)
    val spark = graft.core.Sessions.local("graft-curate")
    val docs = graft.core.Tables(spark, inDir, "documents")
    val marts = Engine.runCorpusPipeline(spark, docs)
    val ledger = marts.ledger.localCheckpoint()
    ledger.write.mode("overwrite").parquet(s"$outDir/ledger")
    val kept = docs.join(
      ledger.filter(col("keep")).select("doc_id", "split"), Seq("doc_id"))
    val splits = kept.select("split").distinct()
      .collect().map(_.getString(0)).sorted
    val nAll = ledger.count()
    if (splits.isEmpty) {
      // every doc dropped by quality/dedup/contamination: reduce() on
      // zero splits would throw and the corpus read would fail — report
      // and skip the corpus write instead
      println(s"[curate] $nAll docs -> 0 kept (all dropped), " +
        s"no corpus written, out=$outDir")
    } else {
      val sharded = splits.map { sp =>
        val part = kept.filter(col("split") === sp)
        part.join(
          graft.operators.Corpus
            .assignShards(part, "text", "doc_id", budget)
            .select("doc_id", "shard"),
          Seq("doc_id"))
      }.reduce(_ unionByName _)
      graft.sources.Partitioned.write(sharded, s"$outDir/corpus",
        Seq("split", "shard"))
      val nKept = spark.read.parquet(s"$outDir/corpus").count()
      println(s"[curate] $nAll docs -> $nKept kept, " +
        s"splits=${splits.mkString(",")}, out=$outDir")
    }
    spark.stop()
  }
}
