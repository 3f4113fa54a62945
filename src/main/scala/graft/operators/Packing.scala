package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign chunked text to fixed-token-budget bins —
  * the step between chunking and batch assembly in an LLM training
  * pipeline (pack short chunks together so padding, not data, is what
  * gets minimized).
  *
  * Distributed formulation: chunks are first routed to `nShards`
  * deterministic shards (id modulo — engine-portable integer math, no
  * hash-function drift between engines), and packing runs
  * INDEPENDENTLY inside each shard via one windowed running token
  * sum: `bin = floor(exclusive_cumsum / maxTokens)`. This is next-fit
  * packing with the boundary rule that a chunk straddling a budget
  * boundary belongs to the bin its first token falls in, so a bin may
  * overflow by at most one chunk's tokens — the standard streaming-
  * packing tradeoff, and the price of an embarrassingly parallel,
  * single-window, no-iteration plan (optimal bin packing is NP-hard
  * and inherently sequential; next-fit is the shape every large-scale
  * pipeline actually ships).
  *
  * Scale: the only shuffle is the window's hash exchange on `shard`;
  * the caller sizes `nShards` to cluster parallelism. Window state is
  * one running sum per partition (O(1) beyond the sort), and there is
  * no global single-partition window anywhere. Determinism comes from
  * the unique (id, chunk_idx) sort inside each shard.
  */
object Packing {

  /** Assign each chunk row to (shard, bin). Output keeps the input
    * columns and appends `shard`, `bin`, and the exclusive running
    * token count `bin_offset` (the chunk's first-token position
    * within its shard's stream, useful for debugging packing
    * decisions downstream).
    *
    * @param tokenCol token count per chunk (long)
    * @param maxTokens bin budget; bins overflow by < one chunk
    * @param nShards  independent packing streams (>= cluster cores)
    */
  def packChunks(chunks: DataFrame, idCol: String, idxCol: String,
                 tokenCol: String, maxTokens: Int,
                 nShards: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(idCol).asc, col(idxCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // floor over doubles is exact here (token totals are far below
    // 2^53) and spells identically in DuckDB — integer division
    // promotes differently across engines.
    val exclusiveCum: Column = sum(col(tokenCol)).over(w) - col(tokenCol)
    chunks
      .withColumn("shard", (col(idCol) % nShards).cast("long"))
      .withColumn("bin_offset", exclusiveCum)
      .withColumn("bin",
        floor(col("bin_offset").cast("double") / maxTokens.toDouble)
          .cast("long"))
  }
}
