package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-aware corpus curation — what happens AFTER duplicate
  * detection. [[Dedup]] finds the duplicate structure (exact groups,
  * near-dup pairs, connected components); these operators consume a
  * cluster assignment `(id, root)` to act on it:
  *
  *  - [[canonicalPerCluster]] keeps ONE representative per cluster by
  *    an explicit priority (highest quality wins, not "lowest id" —
  *    dropping the better-written copy of a near-dup pair measurably
  *    hurts a trained model vs dropping the worse one);
  *  - [[leakproofSplit]] assigns train/val/test by the hash of the
  *    cluster ROOT instead of the document's own id, so every member
  *    of a duplicate cluster lands in the SAME split. Id-hashed splits
  *    leak: a near-copy of a training document in the eval split
  *    inflates eval scores — the standard contamination failure mode
  *    the dedup stack exists to prevent;
  *  - [[histDrift]] measures pairwise distribution distance between
  *    strata (sources, snapshots, splits) as an exact
  *    total-variation permille over a bounded histogram — the drift
  *    monitor that tells a pipeline when a source's content shifted.
  *
  * The columns `root`, `prio`, `keep`, and the split label are
  * OPERATOR-OWNED outputs: pre-existing input columns with those names
  * are replaced, so the operators compose (canonical selection, then a
  * leakproof split of the kept frame) instead of colliding.
  *
  * Scale: cluster tables are bounded by the number of documents IN
  * duplicate clusters (banding survivors — orders of magnitude below
  * corpus size), so the root join broadcasts; the canonical window
  * partitions by root (bounded by cluster size); drift reduces the
  * corpus to a strata×buckets histogram (design constants) in one
  * map-combined aggregation and does all pairing on that tiny table.
  */
object Curation {

  /** Attach each doc's cluster root: docs absent from `clusters` are
    * singletons (root = own id). `clusters` is `(id, root)` as
    * produced by [[Dedup.connectedComponents]]. A pre-existing `root`
    * column on `docs` (e.g. from a previous curation pass) is
    * replaced, not joined against. */
  private def withRoot(docs: DataFrame, idCol: String,
                       clusters: DataFrame): DataFrame =
    docs.drop("root")
      .join(clusters.select(col("id").as(idCol), col("root")),
        Seq(idCol), "left")
      .withColumn("root", coalesce(col("root"), col(idCol)))

  /** One canonical representative per duplicate cluster: the member
    * maximizing `priority` (ties broken by lowest id — deterministic
    * at any partitioning). Returns the input plus `root`, `prio`, and
    * a `keep` verdict; filter on `keep` to materialize the deduped
    * corpus, keep the full frame for audits of what was dropped.
    */
  def canonicalPerCluster(docs: DataFrame, idCol: String,
                          clusters: DataFrame,
                          priority: Column): DataFrame =
    withRoot(docs, idCol, clusters)
      .withColumn("prio", priority)
      .withColumn("keep",
        row_number().over(Window.partitionBy("root")
          .orderBy(col("prio").desc, col(idCol))) === 1)

  /** Duplicate-aware train/val/test split: the split label is a pure
    * function of the cluster ROOT's content hash, so duplicate-cluster
    * members can never straddle splits. Singletons hash their own id —
    * identical to [[DataSplit.splitLabel]], so a cluster-free corpus
    * degenerates to the plain split exactly. */
  def leakproofSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                     labelName: String = "split"): DataFrame =
    withRoot(docs, idCol, clusters)
      .withColumn(labelName, DataSplit.splitLabel(col("root")))

  /** Bounded histogram of `bucket` — the baseline artifact
    * [[graft.streaming.StreamingOps.batchDrift]] probes per
    * micro-batch. One map-combined aggregation; buckets rows out.
    * A NULL bucket (e.g. null text) is a real histogram cell, and
    * [[tvPermille]]/[[histDrift]] match it null-safely. */
  def histogram(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))

  /** Exact TV permille between two histograms `(b, n)` — the one-pair
    * form of [[histDrift]]'s arithmetic (same DECIMAL
    * cross-multiplication and the same null-safe bucket matching, so
    * the two always agree), used by the streaming per-batch monitor.
    * Always returns EXACTLY ONE row `(t_a, t_b, tv_permille)`;
    * tv_permille is NULL when either side is empty (drift from
    * nothing is undefined, and a silent 0 or 1000 would read as a
    * measurement — a monitoring sink still gets its row). */
  def tvPermille(histA: DataFrame, histB: DataFrame): DataFrame = {
    val a = histA.select(col("b").as("b_a"), col("n").as("n_a0"))
    val bb = histB.select(col("b").as("b_b"), col("n").as("n_b0"))
    // null-safe bucket match: a NULL bucket on both sides is the SAME
    // cell (a plain equi-key would count the same mass as disjoint)
    val joined = a.join(bb, col("b_a") <=> col("b_b"), "full_outer")
      .select(coalesce(col("n_a0"), lit(0L)).as("n_a"),
        coalesce(col("n_b0"), lit(0L)).as("n_b"))
    // both aggregates yield exactly one row even over empty inputs
    val tots = joined.agg(
      coalesce(sum("n_a"), lit(0L)).cast("long").as("t_a"),
      coalesce(sum("n_b"), lit(0L)).cast("long").as("t_b"))
    val num = joined.crossJoin(broadcast(tots))
      .agg(coalesce(sum(abs(col("n_a").cast("decimal(38,0)") * col("t_b") -
        col("n_b").cast("decimal(38,0)") * col("t_a"))),
        lit(0L).cast("decimal(38,0)")).as("num"))
    tots.crossJoin(broadcast(num))
      .select(col("t_a"), col("t_b"),
        when(col("t_a") > 0 && col("t_b") > 0,
          expr("(num * 500) div (CAST(t_a AS DECIMAL(38,0)) * t_b)")
            .cast("long")).as("tv_permille"))
  }

  /** Pairwise total-variation distance between every two strata over
    * the distribution of `bucket` (a bounded discretization — e.g.
    * token-count div 32 capped at 63). Exact integer permille:
    * TV = ½·Σ_b |n_ab/N_a − n_bb/N_b|, computed as
    * `(500·Σ|n_ab·N_b − n_bb·N_a|) div (N_a·N_b)` in DECIMAL(38,0)
    * cross-multiplication — no float division, so the verdict is
    * engine- and partitioning-exact (longs alone overflow once
    * n·N exceeds 2^63 ≈ corpora of ~3e9 docs per stratum).
    *
    * Returns `(s_a, s_b, tv_permille)` for s_a < s_b; 0 = identical
    * histograms, 1000 = disjoint support.
    */
  def histDrift(df: DataFrame, strataCol: String,
                bucket: Column): DataFrame = {
    // ONE corpus pass: the histogram is strata×buckets rows (design
    // constants), so cut lineage eagerly — the four downstream uses
    // (totals, bucket union, both join sides) re-read the tiny
    // materialized table, never the corpus (the pagerank/clusters
    // localCheckpoint stance).
    val hist = df.groupBy(col(strataCol).as("s"), bucket.as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = hist.groupBy("s").agg(sum("n").as("tot"))
    // everything below runs on strata×buckets rows — design constants.
    // The NULL stratum is a FIRST-CLASS row (crossSourceMatrix's
    // stance): a bare s_a < s_b is null for any comparison touching
    // it, which would silently drop a null-source stratum from every
    // drift pair — exactly the shift a monitor must not be blind to.
    // NULL sorts first, so it pairs as s_a against every real stratum.
    val pairs = tot.select(col("s").as("s_a"), col("tot").as("t_a"))
      .join(tot.select(col("s").as("s_b"), col("tot").as("t_b")),
        col("s_a") < col("s_b") ||
          (col("s_a").isNull && col("s_b").isNotNull))
    val grid = pairs.crossJoin(hist.select(col("b")).distinct())
    // bucket matches are null-safe (<=>): a NULL bucket is a real
    // cell, not two disjoint ones — same stance as tvPermille
    val ha = hist.select(col("s").as("sa2"), col("b").as("ba2"),
      col("n").as("n_a"))
    val hb = hist.select(col("s").as("sb2"), col("b").as("bb2"),
      col("n").as("n_b"))
    grid
      .join(ha, col("s_a") <=> col("sa2") && col("b") <=> col("ba2"),
        "left")
      .join(hb, col("s_b") <=> col("sb2") && col("b") <=> col("bb2"),
        "left")
      .na.fill(0L, Seq("n_a", "n_b"))
      .groupBy("s_a", "s_b", "t_a", "t_b")
      .agg(sum(abs(col("n_a").cast("decimal(38,0)") * col("t_b") -
        col("n_b").cast("decimal(38,0)") * col("t_a"))).as("num"))
      .select(col("s_a"), col("s_b"),
        expr("(num * 500) div (CAST(t_a AS DECIMAL(38,0)) * t_b)")
          .cast("long").as("tv_permille"))
  }
}
