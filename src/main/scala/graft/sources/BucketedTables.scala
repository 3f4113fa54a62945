package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  *
  * One-sided bucketing still pays when the other side is small and
  * RE-shuffled every run (the ingest-door probes: the corpus index is
  * the bucketed side and never exchanges; the arriving micro-batch
  * shuffles batch-sized rows into the corpus's distribution).
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `keyCols` — sorted buckets additionally let the merge join skip
    * its per-partition sort when each bucket is a single file.
    * `partitionCols` (optional) adds directory partitioning IN FRONT
    * of the bucketing — the layout for a coarse pre-filter key (the
    * banded index's `band`): a reader filtering on it prunes whole
    * directories before the bucket-colocated join runs. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCols: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite,
                    partitionCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keyCols.nonEmpty, "need at least one bucketing column")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
    (if (partitionCols.nonEmpty)
      w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(table)
  }

  /** Append `df` into an existing bucketed table, preserving its
    * distribution: each appended batch is hashed into the SAME bucket
    * layout (Spark validates the spec against the catalog and refuses
    * a mismatch, so an append can never silently degrade the table to
    * un-bucketed). Columns resolve BY NAME (`saveAsTable` append
    * semantics). Cost: one batch-sized shuffle into `buckets` files —
    * the corpus already in the table is NOT rewritten or read.
    *
    * Each append adds one file per touched bucket; the bucketing (and
    * so the exchange-free join) survives, but merge joins re-sort
    * multi-file buckets per partition, so run [[compactBucketed]] on
    * a maintenance cadence to restore single-file buckets.
    *
    * Visibility: the WRITING session's catalog refreshes itself;
    * any OTHER session (including the session that spawned a
    * `foreachBatch` whose clone did the append) caches the table's
    * file listing and must `spark.catalog.refreshTable(table)` before
    * its next read, or it keeps planning over the pre-append files. */
  def appendBucketed(df: DataFrame, table: String, buckets: Int,
                     keyCols: Seq[String],
                     partitionCols: Seq[String] = Nil): Unit =
    writeBucketed(df, table, buckets, keyCols, SaveMode.Append,
      partitionCols)

  /** Compact a bucketed table in place: rewrite the accumulated
    * append files into fresh single-file-per-bucket form (same spec),
    * then swap via catalog rename. Content is unchanged — only the
    * file layout. The swap is drop-then-rename, NOT atomic: a reader
    * planning a query in the gap sees a missing table, and a crash in
    * the gap leaves the data under `<table>_compacting` (recovery:
    * re-run, which restarts from the live table, or rename manually).
    * Run it from the single maintenance owner between jobs — the same
    * single-writer stance as the index appends; readers needing an
    * always-live handle put the TABLE NAME behind an
    * [[graft.operators.IndexMaintenance.VersionedIndexStore]] pointer
    * and compact into a fresh name instead. */
  def compactBucketed(spark: SparkSession, table: String, buckets: Int,
                      keyCols: Seq[String],
                      partitionCols: Seq[String] = Nil): Unit = {
    val staging = table + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    // repartition by the bucket keys first so each bucket's rows
    // arrive on one task and write exactly one file (without it every
    // write task can emit a file into every bucket it sees rows for)
    val keyExprs = keyCols.map(org.apache.spark.sql.functions.col)
    writeBucketed(
      spark.table(table).repartition(buckets, keyExprs: _*),
      staging, buckets, keyCols, partitionCols = partitionCols)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    // renaming a managed partitioned table moves its directory but the
    // catalog's per-partition locations still point at the staging
    // paths — re-register them or every read of the renamed table
    // lists stale directories and returns empty
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE $table")
  }
}
