package graft

/** Every registered query must run green at sf0.001 and return rows
  * (the value-level check is the driver's DuckDB oracle at sf0.01;
  * this catches schema/analysis regressions fast). */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // sketch/hash-based ops are intentionally rows-only
    // (q_agg_percentile_approx is tolerance-checked in PercentileSpec):
    // round 14 converted q_sim_ann_ivf (explicit-quantizer probe,
    // fully SQL-expressible), q_embed_cluster and q_pca_project
    // (exact-integer verdict rows, constant oracles) out of this set;
    // round 15 converted q_sim_ann_lsh (explicit-planes probe),
    // q_semdedup (explicit centroids + recursive-CTE components), and
    // the four near-dup pair queries (q_dedup_simhash_banded,
    // q_dedup_phash, q_dedup_simhash, q_minhash_neardup) to
    // agreement rows vs an independent recomputation
    assert(noOracle == Set("q_agg_approx_distinct",
      "q_agg_percentile_approx",
      "q_sim_ann_recall", "q_dedup_simhash_audit",
      "q_embed_cluster_audit",
      // bloom membership and BPE merge training are hash/iteration
      // artifacts with no SQL form; their value-level coverage is
      // BloomSpec (exact FP audit vs planted contamination)
      // and BpeSpec (merge-table recovery on a planted corpus):
      "q_decontaminate_bloom", "q_decontaminate_bloom_audit",
      "q_bpe_train", "q_bpe_tokencount"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
      // queries that must be non-empty to demonstrate anything
      // (q_dedup_simhash_audit's CORRECT steady-state output is empty —
      // a non-empty audit means the bucket cap is forfeiting recall):
      if (!Set("q_except", "q_dedup_ngram_jaccard",
          "q_dedup_embedding", "q_dedup_simhash_audit").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
