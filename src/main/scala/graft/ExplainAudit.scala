package graft

import org.apache.spark.sql.execution.SparkPlan

/** Plan audit: prints the formatted physical plan for representative
  * queries and flags scale hazards (missing pushed filters, non-broadcast
  * dimension joins, global windows). Run: sbt "runMain graft.ExplainAudit
  * [queryName ...]". */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-explain", "8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p2_filter_eq", "j2_threehop_guard", "j1_m2m_join",
        "a1_count_distinct", "w1_version_rank", "x_ngram_jaccard",
        "x_ngram_jaccard_capped", "x_minhash_lsh_capped", "x_ann_topk",
        "x_ann_ivf", "v2_unfurl", "s10_mitigations", "d1_content_dedup",
        "x_vocab_topk", "x_tfidf_score", "x_chunk_dedup", "x_embed_lsh",
        "d14_cvss31_map", "d15_archive_fold", "s17_search_advisories",
        "s18_search_packages", "i1_advisory_tree", "i2_osv_tree",
        "x_redact_pii", "s19_v1_vulnerabilities", "s20_v1_package_vulns",
        "d4_advisory_sets", "e1_export_rows", "e2_package_index",
        "x_ann_ivf_nprobe", "x_ivf_train", "x_dedup_pipeline_minhash",
        "x_incremental_dedup", "sc4_salted_join", "sc5_bucketed_join",
        "x_ann_ivf_trained", "x_ann_recall", "x_quality_quantiles",
        "x_cardinality_profile", "t8_sessionize", "j15_interval_count",
        "x_bm25_search", "x_ann_recall_planted", "w6b_keyset_page",
        "f24_cwe_lookup", "x_multimodal_decode_real", "i5_oval",
        "x_contamination", "x_semantic_dedup_capped", "x_bpe_train2",
        "d16_default_inferences", "d17_valid_version_inferences",
        "d18_vuln_status", "d19_nginx_inferences", "s21_v3_bulk",
        "s22_patch_set_map", "s23_ssvc_set_trees", "s24_capped_advisories",
        "x_embed_lsh_wide", "e5_purl2cpe", "d21_cveid_backfill",
        "x_lsh_recall", "a15_advisory_ledger", "d17b_openssl_letters",
        "x_chunk_dedup_digest", "x_strip_boilerplate_digest",
        "d20_code_fixes", "x_substring_dedup", "x_lm_perplexity",
        "d17c_apache_buildmeta", "s27_v2_package_list",
        "x_substring_strip", "x_lm_perplexity3", "x_quality_classifier")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        val df = fn(spark, dir)
        // collect() executes THIS dataframe's own QueryExecution so its
        // AdaptiveSparkPlanExec finalizes — count()/write() build a NEW
        // query and leave this one's spans/joins undecided (audit
        // queries are sf0.01-sized, so the collect is small)
        df.collect()
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def render(p: SparkPlan): String = {
          val inner = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec        => Seq(q.plan)
            case other                    => other.children
          }
          p.nodeName + "\n" + p.toString + inner.map(render).mkString
        }
        val s = render(df.queryExecution.executedPlan)
        val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(s).isDefined
        val bcast = s.contains("BroadcastHashJoin")
        val smj = s.contains("SortMergeJoin")
        val globalWin = s.contains("Window") && s.contains("SinglePartition")
        println(s"== $n: pushedFilters=$pushed broadcastJoin=$bcast " +
          s"sortMergeJoin=$smj globalWindowHazard=$globalWin " +
          s"wholeStageCodegen=${s.contains("WholeStageCodegen")}")
      }
    }
    spark.stop()
  }
}
