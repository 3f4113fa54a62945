package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the classic "what is this document
  * about" signal a curation pipeline uses for topic filtering, cluster
  * labeling, and boilerplate detection.
  *
  * Shape (all relational, no driver state):
  *   1. explode tokens → one (doc, term) row per occurrence;
  *   2. tf  = count per (doc, term)   — one shuffle, map-side combined;
  *   3. df  = count per term OVER THE TF TABLE (each (doc, term) pair
  *      is already distinct, so df needs no `distinct`) — vocabulary-
  *      sized, orders of magnitude smaller than the corpus;
  *   4. n   = corpus row count as a 1-row broadcast (never a driver
  *      `.collect`-and-literal, so the plan stays one job);
  *   5. score = tf · ln(n/df), top-k per doc by row_number.
  *
  * The tf⋈df join keys on `term`: df is vocabulary-sized, so AQE
  * downgrades it to a broadcast join at any realistic vocabulary; at
  * 100 TB the join stays term-partitioned and never touches the raw
  * corpus again (both sides are post-aggregation). The final top-k is
  * a per-doc window — bounded k, partitioned by doc, no global sort.
  *
  * Scores are rounded to 4 decimals ([[graft.rnd]] floor form) so the
  * ln() result compares bit-stable across engines.
  */
object Keywords {

  /** Top-k terms per document by TF-IDF. Output: (doc, rank, term, tf,
    * df, score), rank 1-based by (score desc, term asc).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, toks: Column,
                k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc"), explode(toks).as("term"))
    // the tf table feeds BOTH the df aggregate and the score join —
    // persist it (narrow: doc, term, count) so the corpus is
    // tokenized+aggregated once, not once per consumer (lifecycle:
    // session clearCache, same stance as the dedup indexes)
    val tf = terms.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        graft.rnd(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy("doc")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }
}
