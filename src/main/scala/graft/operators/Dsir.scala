package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance reweighting (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a TARGET (clean,
  * in-domain) distribution than under the RAW distribution —
  * log w(x) = Σ_features c_x[b] · (log p_target[b] − log p_raw[b]) —
  * then keep the target-like tail. The hashing trick is the scale
  * lever: both bag-of-n-grams models live in a FIXED m-bucket feature
  * space, so model size is corpus-independent and the scoring join is
  * against an m-row table no matter how many petabytes the raw corpus
  * is.
  *
  * Scale shape: ONE corpus pass explodes unigrams+bigrams and
  * hash-aggregates them to (doc, bucket) counts (map-side combinable);
  * both models are bucket-keyed aggregates OVER THAT TABLE (the
  * target model filters it by the target flag carried through the
  * explode — no second corpus scan); the log-ratio table λ has at
  * most m rows, so the scoring join broadcasts. Per-bucket log-probs
  * are rounded ONCE into integer 1e-4 units (the LM-score stance), so
  * per-doc sums are exact BIGINT — partitioning/combine-order
  * independent, and bit-identical in the DuckDB oracle.
  *
  * Laplace (+1) smoothing over the m buckets keeps λ defined for
  * buckets absent from the target sample; buckets absent from the
  * whole corpus never reach a document, so the λ table only carries
  * observed buckets.
  */
object Dsir {

  /** Engine-portable hashed feature bucket: the leading `hexDigits`
    * hex digits of md5(gram), i.e. m = 16^hexDigits buckets. Same
    * digit-decomposition form is expressible in DuckDB (strpos over
    * the hex alphabet), so oracle queries reproduce bucket ids
    * exactly. */
  def gramBucket(gram: Column, hexDigits: Int): Column =
    conv(substring(md5(gram.cast("binary")), 1, hexDigits), 16, 10)
      .cast("long")

  /** (doc, is_target, bucket, cnt) hashed unigram+bigram counts —
    * the one corpus-sized pass both models and the scoring aggregate
    * reuse. */
  def featureCounts(docs: DataFrame, idCol: String, toks: Column,
                    isTarget: Column, hexDigits: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"), isTarget.as("is_target"),
        explode(concat(toks, TextAnalysis.bigrams(toks))).as("g"))
      .groupBy(col("doc"), col("is_target"),
        gramBucket(col("g"), hexDigits).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-document importance weights against a target subset of the
    * same frame. Output: (doc, n_grams, logw_micro, avg_logw, keep)
    * where `logw_micro` is the exact integer Σ cnt·λ in 1e-4 units,
    * `avg_logw` its per-gram mean, and `keep` marks docs whose
    * per-gram weight exceeds the CORPUS-MEAN per-gram weight — the
    * deterministic "target-like tail" analogue of the paper's Gumbel
    * resampling. An absolute `logw > 0` cutoff would be vacuous:
    * with the target a subset of the raw corpus, smoothing shifts
    * every weight by a corpus-dependent baseline, so selection must
    * be relative to the distribution. The comparison is the exact
    * integer cross-multiplication
    * `logw_micro · Σn > Σlogw · n_grams` (no division), so
    * membership is bit-stable across engines and partitionings
    * (corpus-total × per-doc products stay within long for
    * Σ n_grams · max|logw_micro| < 2^63 — beyond that the sums
    * move to decimal, same rule as the temperature mix).
    *
    * @param isTarget  predicate marking the clean/in-domain rows that
    *                  define the target distribution (they are scored
    *                  too — a target doc with an unusual feature mix
    *                  can still score raw-like)
    * @param hexDigits feature-space size as md5 hex digits
    *                  (m = 16^hexDigits; 3 ⇒ 4096 buckets)
    */
  def importanceWeights(docs: DataFrame, idCol: String, toks: Column,
                        isTarget: Column, hexDigits: Int = 3,
                        persistCounts: Boolean = true): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 7,
      s"hexDigits must be in [1, 7], got $hexDigits")
    val m = math.pow(16, hexDigits).toLong
    val feats0 = featureCounts(docs, idCol, toks, isTarget, hexDigits)
    // feeds the raw model, the target model, and the scoring join —
    // three aggregates over one corpus shuffle (persist opt-out for
    // one-shot calls in long-lived sessions, the lshIndex stance)
    val feats =
      if (persistCounts) feats0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else feats0
    val rawM = feats.groupBy("bucket").agg(sum("cnt").as("cq"))
    val tgtM = feats.filter(col("is_target"))
      .groupBy("bucket").agg(sum("cnt").as("cp"))
    val tots = rawM.agg(sum("cq").as("tq")).crossJoin(
      tgtM.agg(coalesce(sum("cp"), lit(0L)).as("tp")))
    // λ in integer 1e-4 units, each ln rounded once per bucket: the
    // rounding happens per MODEL term, so Spark and the oracle agree
    // bucket-by-bucket and every downstream sum is exact
    val lam = rawM.join(tgtM, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        (floor(log((coalesce(col("cp"), lit(0L)) + lit(1L))
            .cast("double") / (col("tp") + lit(m)).cast("double"))
          * 1e4 + 0.5).cast("long") -
         floor(log((col("cq") + lit(1L)).cast("double")
            / (col("tq") + lit(m)).cast("double"))
          * 1e4 + 0.5).cast("long")).as("lam"))
    val perDoc0 = feats.join(lam, "bucket")
      .groupBy(col("doc"))
      .agg(sum("cnt").cast("long").as("n_grams"),
        sum(col("cnt") * col("lam")).cast("long").as("logw_micro"))
    // feeds the corpus-total aggregate AND the keep join — persisted
    // under the same opt-out (narrow: 3 columns, one row per doc)
    val perDoc =
      if (persistCounts) perDoc0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else perDoc0
    val corpusTot = perDoc.agg(
      sum("logw_micro").cast("long").as("tot_logw"),
      sum("n_grams").cast("long").as("tot_n"))
    perDoc.crossJoin(broadcast(corpusTot))
      .withColumn("avg_logw",
        col("logw_micro").cast("double") / (col("n_grams") * lit(1e4)))
      .withColumn("keep",
        col("logw_micro") * col("tot_n") >
          col("tot_logw") * col("n_grams"))
      .drop("tot_logw", "tot_n")
  }
}
