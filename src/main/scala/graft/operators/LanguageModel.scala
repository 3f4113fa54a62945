package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the KenLM-style
  * "does this document read like the corpus" quality signal
  * (CCNet-family pipelines filter on LM perplexity), reduced to the
  * unigram order so the model is purely relational (a term-count
  * table) and the score is oracle-exact.
  *
  * Model: p(term) = c(term) / T, counts over the scored corpus itself
  * — every token is in-vocabulary by construction, so no smoothing
  * term can silently change semantics between engines.
  * Score: mean log-likelihood per document,
  * `avg over token occurrences of ln p(token)` (higher = more typical;
  * boilerplate-heavy and gibberish docs land in opposite tails).
  *
  * Shape (all relational, no driver state):
  *  1. tf = count per (doc, term) — ONE corpus shuffle, map-combined;
  *     persisted, since it feeds both the vocabulary aggregate and the
  *     score join (the [[Keywords.tfidfTopK]] stance);
  *  2. vocabulary c = sum(tf) per term — vocabulary-sized, orders of
  *     magnitude smaller than the corpus (Heaps' law);
  *  3. T = 1-row broadcast total (never a driver collect-and-literal);
  *  4. per-term log-prob in INTEGER micro-units:
  *     `lp = floor(ln(c/T)·1e4 + 0.5)` as BIGINT — one ln() per
  *     vocabulary term, rounded once ([[graft.rnd]] floor form), so
  *     step 5's per-doc sum is exact integer arithmetic and therefore
  *     independent of partitioning and combine order (the same
  *     micro-unit trick the k-means centroid sums use);
  *  5. per-doc `sum(tf·lp)` + one double division at the end.
  *
  * The tf⋈lp join keys on `term`; both sides are post-aggregation
  * (never the raw corpus), the lp side is exactly one row per term, so
  * AQE can broadcast it at realistic vocabularies and split hot-term
  * (stopword) partitions freely at 100 TB.
  */
object LanguageModel {

  /** Per-document mean unigram log-likelihood. Output:
    * (doc, n_tok, lp_micro, avg_logp) where `lp_micro` is the exact
    * integer sum of 1e-4-unit token log-probs and
    * `avg_logp = lp_micro / (n_tok · 1e4)`.
    */
  def unigramScore(docs: DataFrame, idCol: String, toks: Column,
                   persistCounts: Boolean = true): DataFrame = {
    val terms = docs.select(col(idCol).as("doc"), explode(toks).as("term"))
    val tf0 = terms.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    // persistCounts = false trades a second corpus shuffle for zero
    // cache residue — for one-shot calls in long-lived sessions that
    // would otherwise accumulate MEMORY_AND_DISK blocks until
    // clearCache (same opt-out the staged ANN indexes expose)
    val tf =
      if (persistCounts) tf0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tf0
    val vocab = tf.groupBy("term").agg(sum("tf").as("c"))
    val tot = vocab.agg(sum("c").as("t"))
    val lp = vocab.crossJoin(broadcast(tot))
      .withColumn("lp",
        floor(log(col("c").cast("double") / col("t")) * 1e4 + 0.5)
          .cast("long"))
    tf.join(lp.select("term", "lp"), "term")
      .groupBy(col("doc"))
      .agg(sum("tf").cast("long").as("n_tok"),
        sum(col("tf") * col("lp")).cast("long").as("lp_micro"))
      .withColumn("avg_logp",
        col("lp_micro").cast("double") / (col("n_tok") * lit(1e4)))
  }

  /** THE bigram MLE log-prob construction, shared by [[bigramLm]] and
    * [[bigramScore]]: contexts = Σ_cur c2(prev cur) derived from the
    * bigram count table itself (per-context probs sum to exactly 1,
    * no end-of-document convention), log-probs in integer 1e-4 units.
    * Tokens cannot contain the delimiter (they come from split on
    * it), so the context is recoverable from the bigram string.
    * Input: (bg, c2) counts. Output: (bg, lp).
    */
  private def bigramLpTable(c2: DataFrame): DataFrame = {
    val ctx = c2.groupBy(split(col("bg"), " ").getItem(0).as("prev"))
      .agg(sum("c2").as("c1"))
    c2.join(ctx, split(col("bg"), " ").getItem(0) === col("prev"))
      .withColumn("lp",
        floor(log(col("c2").cast("double") / col("c1")) * 1e4 + 0.5)
          .cast("long"))
      .select("bg", "lp")
  }

  /** Train-side artifact: the bigram conditional log-prob table
    * (bg, lp in integer 1e-4 units) factored out of [[bigramScore]] so
    * ONE corpus can score ANOTHER — the real CCNet deployment (train
    * on a clean reference corpus, score the crawl). The bigram count
    * table is persisted because it feeds both the context aggregate
    * and the join probe (the same reused-count-table stance as
    * [[unigramScore]]'s tf).
    */
  def bigramLm(docs: DataFrame, toks: Column,
               persistCounts: Boolean = true): DataFrame = {
    val c20 = docs.select(explode(TextAnalysis.bigrams(toks)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
    val c2 =
      if (persistCounts) c20.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else c20
    bigramLpTable(c2)
  }

  /** Score documents against a PREBUILT LM over arbitrary units
    * (terms, bigrams, shingles): per-doc unit counts LEFT-join the
    * model, so out-of-vocabulary units count toward `coverage` but not
    * the likelihood — low coverage IS the off-domain signal, and the
    * in-model mean log-prob stays uncontaminated by an arbitrary OOV
    * penalty. All sums exact integers; `avg_logp` is over MODELED
    * units (0 when none are modeled — the `greatest` guard keeps the
    * division engine-exact instead of null/inf-divergent).
    *
    * Output: (doc, n_units, n_modeled, lp_micro, coverage, avg_logp).
    */
  def scoreWithLm(docs: DataFrame, idCol: String, units: Column,
                  lm: DataFrame, unitCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc"), explode(units).as(unitCol))
      .groupBy("doc", unitCol).agg(count(lit(1)).as("tf"))
    tf.join(lm.select(col(unitCol), col("lp")), Seq(unitCol), "left")
      .groupBy(col("doc"))
      .agg(sum("tf").cast("long").as("n_units"),
        sum(when(col("lp").isNotNull, col("tf")).otherwise(0L))
          .cast("long").as("n_modeled"),
        sum(col("tf") * coalesce(col("lp"), lit(0L)))
          .cast("long").as("lp_micro"))
      .withColumn("coverage",
        col("n_modeled").cast("double") / col("n_units"))
      .withColumn("avg_logp",
        col("lp_micro").cast("double") /
          (greatest(col("n_modeled"), lit(1L)) * lit(1e4)))
  }

  /** Per-document mean bigram conditional log-likelihood —
    * `avg over transitions of ln p(cur | prev)` with
    * `p(cur | prev) = c2(prev cur) / Σ_cur c2(prev cur)`.
    *
    * The second-order typicality signal: a bag of perfectly common
    * tokens in a nonsense ORDER scores high under the unigram model
    * but low here. The MLE table is [[bigramLpTable]] (self-trained:
    * the model's c2 comes from the scored corpus's own tf2, so the
    * persisted per-doc count table feeds training AND scoring off one
    * corpus scan). Documents with fewer than two tokens have no
    * transitions and are absent from the output (inner-join
    * semantics, documented).
    *
    * Output: (doc, n_big, lp_micro, avg_logp).
    */
  def bigramScore(docs: DataFrame, idCol: String, toks: Column,
                  persistCounts: Boolean = true): DataFrame = {
    val pairs = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.bigrams(toks)).as("bg"))
    val tf20 = pairs.groupBy("doc", "bg").agg(count(lit(1)).as("tf"))
    val tf2 =
      if (persistCounts) tf20.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tf20
    val lp = bigramLpTable(tf2.groupBy("bg").agg(sum("tf").as("c2")))
    tf2.join(lp, "bg")
      .groupBy(col("doc"))
      .agg(sum("tf").cast("long").as("n_big"),
        sum(col("tf") * col("lp")).cast("long").as("lp_micro"))
      .withColumn("avg_logp",
        col("lp_micro").cast("double") / (col("n_big") * lit(1e4)))
  }
}
