package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted corpus mixing — the "epochs per source" knob
  * of a training-data pipeline (e.g. wiki ×2.25, web ×0.5).
  *
  * A weight w for a stratum means: every row appears floor(w) times,
  * plus one more copy iff its content hash falls under the fractional
  * remainder (in 1/256 units). Membership is a pure function of the
  * row id, so the mix reproduces across engines, partitionings, and
  * backfills — same guarantee as [[DataSplit.stratifiedSample]], which
  * covers only w ≤ 1. Upsampling is a generator (`explode(sequence)`),
  * not a shuffle: the whole operator is map-only and the copy index is
  * explicit in the output, so downstream packing/shuffling can spread
  * replicas deterministically.
  *
  * The hash is salted with ":mix" so mix membership is independent of
  * the train/val/test split buckets ([[DataSplit.hashBucket256]]) — an
  * unsalted reuse would correlate "gets an extra epoch" with "lands in
  * the test split".
  */
object Mixing {

  /** 256-way bucket of md5(id || salt) — decorrelated from other
    * hash-bucket uses of the same id. */
  def saltedBucket256(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt)).cast("binary")),
      1, 2), 16, 10).cast("long")

  /** Weight → (full copies, fractional remainder out of 256). */
  private[graft] def weightParts(w: Double): (Int, Int) = {
    require(w >= 0.0 && w <= 16.0, s"weight out of range [0,16]: $w")
    val copies = math.floor(w).toInt
    val frac = math.round((w - copies) * 256).toInt
    if (frac == 256) (copies + 1, 0) else (copies, frac)
  }

  /** Rows of `df` replicated per-stratum by `weights` (missing strata
    * get `defaultWeight`), with a 0-based `copy` index column. Output
    * rows: one per (row, copy) kept. Map-only: a when-chain projection,
    * one generator, one codegen filter — no shuffle, no driver state.
    */
  def mixWeighted(df: DataFrame, idCol: String, strataCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 0.0,
                  copyName: String = "copy"): DataFrame = {
    val (dCopies, dFrac) = weightParts(defaultWeight)
    // sorted for a deterministic when-chain (Map order is not stable)
    val parts = weights.toSeq.sortBy(_._1).map { case (k, w) =>
      (k, weightParts(w))
    }
    val copiesCol = parts.foldLeft(lit(dCopies)) { case (acc, (k, (c, _))) =>
      when(col(strataCol) === k, lit(c)).otherwise(acc)
    }
    val fracCol = parts.foldLeft(lit(dFrac)) { case (acc, (k, (_, f))) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    replicateByParts(
      df.withColumn("graft_copies", copiesCol)
        .withColumn("graft_frac", fracCol),
      idCol, copyName, ":mix")
  }

  /** Replication tail shared by the mixing operators: expects
    * `graft_copies` / `graft_frac` (out of 256) columns, emits one row
    * per kept (row, copy) with the copy index explicit. Map-only.
    */
  private def replicateByParts(df: DataFrame, idCol: String,
                               copyName: String, salt: String): DataFrame =
    // sequence is inclusive: indices 0..copies; index `copies` is the
    // fractional copy, kept only when the salted bucket clears frac.
    // The generator must be the TOP-level expression of its projection
    // (no cast around it) or the analyzer rejects the plan; widen to
    // long in a separate projection after.
    df.withColumn(copyName, explode(sequence(lit(0), col("graft_copies"))))
      .withColumn(copyName, col(copyName).cast("long"))
      .filter(col(copyName) < col("graft_copies") ||
        saltedBucket256(col(idCol), salt) < col("graft_frac"))
      .drop("graft_copies", "graft_frac")

  /** Per-stratum epochs (in 1/256 units) for temperature-based
    * rebalancing at α = 1/2 (sampling temperature τ = 2, the common
    * multilingual/multi-source LM training setting): sampling
    * probability q_s ∝ sqrt(p_s), epochs e_s = q_s·N/n_s — rare strata
    * are upsampled, dominant strata downsampled, expected output size
    * ≈ N. A NULL stratum is a stratum like any other (groupBy keeps
    * it; [[mixTemperature]] joins null-safely), so no row is silently
    * dropped and n_tot always covers the whole corpus.
    *
    * Exactness: each stratum's term `floor(sqrt(n_s/N)·1e6 + 0.5)` is
    * one correctly-rounded IEEE chain on exact integer operands
    * (sqrt IS correctly rounded, unlike pow — which is why the
    * exponent is fixed at 1/2 rather than a free τ), the terms sum as
    * integers, and e256 is one exact long division — so the whole
    * weight table reproduces bit-identically on any engine. Long
    * bounds: needs term·256·N < 2^63 (N < ~3.6e10 rows — a 100 TB
    * corpus at ~3 KB/doc) and S_µ·max(n_s) < 2^63 (|strata|·1e6·N);
    * beyond that the division moves to decimal.
    *
    * Plan shape: ONE corpus aggregation (map-combined groupBy); the
    * corpus-total and term-sum folds run as unpartitioned windows over
    * the STRATA-SIZED count table — the repo's established
    * one-row-per-bucket exception, bounded by |strata| — so the corpus
    * is never re-scanned for a total. No driver collect.
    */
  def temperatureE256(df: DataFrame, strataCol: String,
                      maxEpochs: Int = 16): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 16,
      s"maxEpochs out of range [1,16]: $maxEpochs")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_s"))
      .withColumn("n_tot", sum("n_s").over(wAll))
      .withColumn("term",
        floor(sqrt(col("n_s").cast("double") / col("n_tot")) * 1e6 + 0.5)
          .cast("long"))
      .withColumn("s_micro", sum("term").over(wAll))
      .withColumn("e256",
        least(expr("term * 256 * n_tot div (s_micro * n_s)"),
          lit(maxEpochs * 256L)))
      .select(col(strataCol), col("e256"))
  }

  /** Temperature-rebalanced corpus mix (α = 1/2): [[temperatureE256]]
    * epochs applied through the same deterministic replication as
    * [[mixWeighted]], salted ":mixT" so membership is independent of
    * both the weighted mix and the train/val/test split buckets. The
    * weight join is NULL-SAFE on the stratum, so null-stratum rows mix
    * at their own stratum's weight instead of vanishing.
    */
  def mixTemperature(df: DataFrame, idCol: String, strataCol: String,
                     maxEpochs: Int = 16,
                     copyName: String = "copy"): DataFrame = {
    val w = temperatureE256(df, strataCol, maxEpochs)
      .withColumnRenamed(strataCol, "graft_strata")
    replicateByParts(
      df.join(broadcast(w), col(strataCol) <=> col("graft_strata"))
        .withColumn("graft_copies", expr("e256 div 256").cast("int"))
        .withColumn("graft_frac", expr("e256 % 256").cast("int"))
        .drop("e256", "graft_strata"),
      idCol, copyName, ":mixT")
  }
}
