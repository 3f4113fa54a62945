package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: score every training document by the
  * fraction of its distinct word n-grams that also appear in an
  * evaluation (benchmark) set — the standard guard against test-set
  * leakage into LLM training data. Documents above the threshold get
  * flagged for removal; the ratio itself is kept so the cutoff can be
  * re-tuned without recomputing the overlap.
  *
  * Scale shape: the eval side is a benchmark suite — tiny relative to
  * a 100 TB training corpus — so its distinct shingle set is
  * broadcast and the train-side probe is a map-side broadcast hash
  * join: ONE pass over the training shingles, no shuffle of the
  * corpus-sized index, then a partial+final hash aggregate per doc.
  * Hits and totals are counted in the SAME left-join aggregate (a
  * semi-join plus a separate total count would evaluate the train
  * shingle index twice).
  */
object Decontaminate {

  /** Per-train-doc contamination against the eval docs' n-grams.
    *
    * @param docs      corpus with an id and a text column
    * @param isEval    predicate marking eval/benchmark rows
    * @param n         shingle width (words)
    * @param threshold ratio at or above which a doc is flagged
    * @return (doc_id, n_shingles, n_eval_hits, contamination,
    *         contaminated) — one row per train doc that has at least
    *         one n-gram (shorter docs have no overlap surface)
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    isEval: Column, n: Int = 3,
                    threshold: Double = 0.5): DataFrame = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    // filter BEFORE shingling so each side's predicate reaches its
    // parquet scan (the eval side then reads only benchmark row
    // groups instead of exploding the whole corpus a second time)
    def sh(side: DataFrame) = side.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n)))
        .as("g"))
    val evalG = sh(docs.filter(isEval)).select(col("g")).distinct()
      .withColumn("hit", lit(1))
    sh(docs.filter(!isEval))
      .join(broadcast(evalG), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_eval_hits"))
      .withColumn("contamination",
        graft.rnd(col("n_eval_hits").cast("double") /
          col("n_shingles").cast("double"), 4))
      .withColumn("contaminated", col("contamination") >= threshold)
  }
}
