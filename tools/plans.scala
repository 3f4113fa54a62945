import java.io.PrintWriter
val sf = "/root/testdata/sf0.01"
val out = new PrintWriter("/root/repo/docs/PLANS.md")
out.println("# Physical plans of headline queries (sf0.01, local[4])")
out.println()
out.println("Regenerated with `spark-shell -I tools/plans.scala`. What to check:")
out.println("`PushedFilters` reaching every parquet scan, `BroadcastHashJoin` on")
out.println("dim joins, `SortMergeJoin` (no input shuffle) where bucketing/hints")
out.println("apply, `WholeStageCodegen` spans covering the compute, and the")
out.println("native `graft_dot` inside vector kernels.")
for (n <- Seq("q_scan_filter_pushdown", "q_join_broadcast", "q_join_smj",
              "q_join_asof", "q_agg_hash", "q_win_rank", "q_sort_limit",
              "q_dedup_ngram_jaccard", "q_sim_cosine_topk", "q_win_session",
              "q_topk_per_group_native", "q_win_ntile", "q_sim_ann_ivf",
              "q_minhash_neardup", "q_text_pipeline",
              "q_join_theta_banded", "q_pack_sequences",
              "q_sim_ann_recall", "q_decontaminate", "q_agg_stats",
              "q_embed_cluster", "q_semdedup", "q_text_tfidf",
              "q_global_shuffle", "q_sim_ann_pq", "q_mix_weighted",
              "q_text_heavy_hitters", "q_source_cap", "q_token_budget",
              "q_dedup_spans", "q_text_lm_score", "q_text_lm_bigram",
              "q_embed_outliers", "q_dedup_matrix", "q_corpus_stats",
              "q_mix_temperature", "q_text_lm_crossscore",
              "q_dedup_phash", "q_text_quality_model",
              "q_sim_ann_ivfpq", "q_dedup_substring",
              "q_dedup_substring_strip", "q_text_quality_fit",
              "q_decontaminate_bloom", "q_bpe_tokencount",
              "q_text_entropy", "q_pca_moments", "q_pca_project",
              "q_dsir_weights", "q_embed_quantize", "q_embed_rproject",
              "q_mine_hard_negatives", "q_fuzzy_join_ed",
              "q_graph_pagerank", "q_dedup_canonical",
              "q_split_leakproof", "q_corpus_drift",
              "q_sample_weighted", "q_curation_pipeline",
              "q_text_bm25", "q_text_bm25_pruned",
              "q_text_bm25_staged", "q_retrieval_rerank",
              "q_retrieval_hybrid_rrf", "q_text_bm25_deleted",
              "q_retrieval_takedown_audit", "q_text_bm25_filtered",
              "q_ann_takedown_audit", "q_sim_ann_ivf_staged",
              "q_sim_ann_lsh", "q_sim_ann_lsh_staged",
              "q_dedup_simhash_banded")) {
  out.println(s"\n## $n\n")
  out.println("```")
  val df = graft.SparkEntry.queries(n)(spark, sf)
  out.println(df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode))
  out.println("```")
}
out.close()
println("WROTE /root/repo/docs/PLANS.md")
sys.exit(0)
