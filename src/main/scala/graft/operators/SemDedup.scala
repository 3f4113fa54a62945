package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semantic deduplication (SemDeDup-style): cluster embeddings with
  * k-means, find cosine-near-identical pairs WITHIN each cluster,
  * and keep one representative per duplicate group. The clustering
  * is what makes the pairwise step tractable — members only compare
  * against their own cluster, so the quadratic term is
  * sum(cluster_size²), controlled by k (production runs pick k large
  * enough that clusters are thousands, not millions) plus an
  * explicit census cap on degenerate clusters.
  *
  * Composition of three engine operators, each already scale-audited:
  * [[Similarity.kmeans]] (broadcast-NLJ rounds, exact centroid sums),
  * the cluster-equi-join pairwise probe with the census +
  * broadcast-anti skew guard used by every banded dedup here, and
  * [[Dedup.connectedComponents]] (single-task union-find under the
  * edge budget, pointer jumping above it) so transitive duplicate
  * chains collapse to ONE survivor — pair-local keep decisions would
  * split a~b~c into two overlapping drop sets.
  */
object SemDedup {

  /** Per-vector keep/drop verdict.
    *
    * @param cosThreshold pairs at or above this cosine are duplicates
    * @param clusterCap   clusters larger than this are skipped by the
    *                     pairwise probe (their members are all kept) —
    *                     a degenerate mega-cluster means k was too
    *                     small for the corpus, and quadratic probing
    *                     inside it would be the scale-killer
    * @return (id, cluster, keep_id, keep): keep_id = the duplicate
    *         group's minimum id (itself when not a duplicate)
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
               cosThreshold: Double = 0.95, maxIter: Int = 5,
               clusterCap: Long = 100000L): DataFrame = {
    Guards.requireIntegral(vecs.schema(idCol).dataType, "semDedup",
      s"id ('$idCol')", "the dedup verdict joins on a long id")
    dedupAssigned(vecs, idCol, vecCol,
      Similarity.kmeans(vecs, idCol, vecCol, k, maxIter)
        .select(col("id"), col("cluster")),
      cosThreshold, clusterCap)
  }

  /** [[semDedup]] under a caller-supplied FROZEN centroid table — the
    * externally-trained-quantizer tense
    * ([[Similarity.ivfIndexWithCentroids]]'s stance): assignment is
    * [[Similarity.assignToCentroids]]' L2 argmin (ties → smallest
    * cluster id), everything downstream identical to the k-means
    * form. What makes the WHOLE pipeline oracle-expressible when the
    * centroids are an id-picked corpus subset: assignment, the
    * within-cluster cosine pairs, and the transitive duplicate groups
    * (a recursive-CTE reachability in the DuckDB twin) are each plain
    * SQL — q_semdedup's conversion out of rows-only. */
  def semDedupWithCentroids(vecs: DataFrame, idCol: String,
                            vecCol: String, cents: Seq[Seq[Double]],
                            cosThreshold: Double = 0.95,
                            clusterCap: Long = 100000L): DataFrame = {
    require(cents.nonEmpty,
      "semDedupWithCentroids needs at least one centroid")
    dedupAssigned(vecs, idCol, vecCol,
      Similarity.assignToCentroids(vecs, idCol, vecCol, cents)
        .select(col("id"), col("cluster")),
      cosThreshold, clusterCap)
  }

  /** The shared downstream of both assignment tenses: capped
    * within-cluster pairwise probe, transitive collapse, per-vector
    * verdict. */
  private def dedupAssigned(vecs: DataFrame, idCol: String,
                            vecCol: String, assigned: DataFrame,
                            cosThreshold: Double,
                            clusterCap: Long): DataFrame = {
    val m = Similarity.nonNullVecs(vecs, vecCol)
      .select(col(idCol).cast("long").as("id"),
        Similarity.toDouble(col(vecCol)).as("v"))
      .join(assigned, "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hot = m.groupBy(col("cluster"))
      .agg(count(lit(1)).as("csz"))
      .filter(col("csz") > clusterCap).select("cluster")
    val capped = m.join(broadcast(hot), Seq("cluster"), "left_anti")
    val pairs = capped.select(col("cluster"), col("id").as("id_a"),
        col("v").as("v_a"))
      .join(capped.select(col("cluster"), col("id").as("id_b"),
        col("v").as("v_b")), "cluster")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= cosThreshold)
      .select(col("id_a"), col("id_b"))
    val roots = Dedup.connectedComponents(pairs, "id_a", "id_b")
    m.select(col("id"), col("cluster"))
      .join(roots.withColumnRenamed("node", "id"), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("root"), col("id")).as("keep_id"))
      .withColumn("keep", col("keep_id") === col("id"))
  }
}
