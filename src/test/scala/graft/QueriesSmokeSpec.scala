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
    // ONLY the two sketch rows whose OUTPUT is the approximation stay
    // rows-only (q_agg_percentile_approx is tolerance-checked in
    // PercentileSpec; q_agg_distinct is q_agg_approx_distinct's exact
    // oracled twin) — the principled floor. Round 14 converted
    // q_sim_ann_ivf / q_embed_cluster / q_pca_project; round 15
    // q_sim_ann_lsh, q_semdedup, and the four near-dup pair queries;
    // round 16 converted the last seven: q_sim_ann_recall (per-method
    // floor verdicts), q_dedup_simhash_audit (census agreement),
    // q_embed_cluster_audit (Lloyd audit-trail contracts),
    // q_decontaminate_bloom(+_audit) (one-sided-error verdicts vs the
    // exact path), q_bpe_train (distributed-vs-driver regime
    // agreement), q_bpe_tokencount (codegen encode vs a plain driver
    // merge fold).
    assert(noOracle == Set("q_agg_approx_distinct",
      "q_agg_percentile_approx"))
  }

  test("bench-only tenses never shadow a registry query") {
    assert(SparkEntry.benchOnlyQueries.keySet
      .intersect(SparkEntry.queries.keySet).isEmpty)
  }

  test("pairAgreementVerdict: duplicate emission and value spread are " +
    "not invisible (round 16, ADVICE)") {
    import spark.implicits._
    def row(v: Seq[(Long, Long, Long)],
            col: String = "ham"): org.apache.spark.sql.DataFrame =
      v.toDF("doc_a", "doc_b", col)
    val re = row(Seq((1L, 2L, 3L), (4L, 5L, 0L)))
    val nonEmpty = Seq(1L).toDF("x")
    def verdict(em: org.apache.spark.sql.DataFrame) =
      graft.queries.TextQueries
        .pairAgreementVerdict(em, re, "ham", nonEmpty)
        .select("checked_nonzero", "n_extra", "n_missing",
          "n_val_diff", "n_dup_emitted")
        .as[(Long, Long, Long, Long, Long)].first()
    // exact agreement: all counters zero
    assert(verdict(row(Seq((1L, 2L, 3L), (4L, 5L, 0L))))
      == ((1L, 0L, 0L, 0L, 0L)))
    // a double-emitted pair (same value) flips ONLY n_dup_emitted
    assert(verdict(row(Seq((1L, 2L, 3L), (1L, 2L, 3L), (4L, 5L, 0L))))
      == ((1L, 0L, 0L, 0L, 1L)))
    // duplicates with DIFFERENT values flip n_val_diff too, even
    // though one of them matches the recomputation
    assert(verdict(row(Seq((1L, 2L, 3L), (1L, 2L, 7L), (4L, 5L, 0L))))
      == ((1L, 0L, 0L, 1L, 1L)))
    // extra / missing stay what they were
    assert(verdict(row(Seq((1L, 2L, 3L), (4L, 5L, 0L), (6L, 7L, 1L))))
      == ((1L, 1L, 0L, 0L, 0L)))
    assert(verdict(row(Seq((1L, 2L, 3L))))
      == ((1L, 0L, 1L, 0L, 0L)))
  }

  (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)
    .toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
      // queries that must be non-empty to demonstrate anything:
      if (!Set("q_except", "q_dedup_ngram_jaccard",
          "q_dedup_embedding").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
