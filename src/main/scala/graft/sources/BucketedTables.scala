package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed parquet tables: the storage-layout half of the engine's
  * co-located join story. Writing both sides of a recurring join
  * bucketed (and sorted) by the join key means every later join
  * between them plans as a sort-merge join with NO exchange on
  * either side — at 100 TB the shuffle that bucketing removes is the
  * single largest cost in the plan, and it is removed for EVERY
  * downstream join against the table, not just one.
  *
  * The bucket function is Spark's Murmur3-based `hash(key) pmod n`,
  * recorded in the catalog; readers recover the distribution from
  * metadata, so the guarantee survives sessions. Pick the bucket
  * count like a shuffle partition count at the table's full size
  * (rows per bucket sized to executor memory), and bucket both
  * tables with the SAME count — mismatched counts fall back to a
  * shuffle on one side.
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `keyCols` — sorted buckets additionally let the merge join skip
    * its per-partition sort when each bucket is a single file. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCols: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keyCols.nonEmpty, "need at least one bucketing column")
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }
}
