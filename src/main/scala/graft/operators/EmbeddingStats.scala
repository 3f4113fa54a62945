package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space distribution statistics for corpus curation — the
  * D4/SemDeDup-family "prune points far from their cluster centroid"
  * signal (outliers are disproportionately mislabeled, OCR-garbled, or
  * off-domain documents).
  *
  * Oracle-exactness stance: distances are computed over vectors
  * QUANTIZED to integer micro-units (`floor(v·1e6 + 0.5)`, a 5e-7/dim
  * quantization error that cannot reorder any meaningful outlier
  * ranking), and the per-group centroid is itself rounded to
  * micro-units. Every sum after the one float→micro cast is exact
  * BIGINT arithmetic — partitioning- and engine-independent, the same
  * stance as the k-means decimal sums and the LM micro-unit scores.
  *
  * Shape:
  *  1. micro-quantize: map-only projection (no persist — the quantized
  *     corpus is corpus-sized, so caching it would trade unbounded
  *     executor memory for one cheap rescan; two scans is the right
  *     call at 100 TB);
  *  2. per-(group, dim) sums: posexplode → groupBy — the exchange is
  *     map-combined down to groups·dim rows per partition;
  *  3. centroids re-assembled into per-group arrays with an exact
  *     integer division midpoint-round — groups·dim rows total, then
  *     BROADCAST back (never a driver collect);
  *  4. score scan: zip_with/aggregate integer fold per row, map-only;
  *  5. top-k farthest per group: bounded window (rank ≤ k ⇒ Spark
  *     plans the partial WindowGroupLimit pushdown).
  */
object EmbeddingStats {

  /** Top-k farthest-from-centroid vectors per group. Output:
    * (grp, rank, id, dist2_micro) — dist² in 1e-12 units (micro² ),
    * rank 1-based by (dist2 desc, id asc).
    */
  def centroidOutliers(vecs: DataFrame, idCol: String, vecCol: String,
                       grpCol: String, k: Int): DataFrame = {
    val m = Similarity.nonNullVecs(vecs, vecCol)
      .select(col(idCol).as("id"), col(grpCol).as("grp"),
        transform(col(vecCol), Similarity.microQuantize(_)).as("mv"))
    val sums = m.select(col("grp"),
        posexplode(col("mv")).as(Seq("pos", "val")))
      .groupBy("grp", "pos")
      .agg(sum("val").as("s"), count(lit(1)).as("n"))
    // midpoint-rounded centroid component. The cross-engine bit-
    // identity argument needs |s| < 2^53 so the long→double cast is
    // exact: with ~1e6-unit components that bounds rows-per-group at
    // ~9e9 — enough for any per-label/per-cluster grouping, but a
    // SINGLE group over a 100B-row corpus would need the division
    // moved to exact integer arithmetic first
    val cents = sums
      .withColumn("c",
        floor(col("s").cast("double") / col("n") + 0.5).cast("long"))
      .groupBy("grp")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
    val scored = m.join(broadcast(cents), "grp")
      .withColumn("dist2_micro",
        aggregate(
          zip_with(col("mv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (a, x) => a + x))
    val w = Window.partitionBy("grp")
      .orderBy(col("dist2_micro").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank"), col("id"), col("dist2_micro"))
  }
}
