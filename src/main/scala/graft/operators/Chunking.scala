package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for LLM training pipelines: split each document
  * into overlapping fixed-size token windows (the pre-tokenization
  * step before packing sequences). Chunk starts advance by
  * `chunkTokens - overlap`; the tail chunk may be short.
  *
  * Pure generator plan: tokens → `sequence` of window starts →
  * `transform`+`slice` → `posexplode`. One narrow projection per
  * document, no shuffle, no UDF — scales as a map-only stage and
  * parallelizes by input split regardless of document count.
  */
object Chunking {

  /** Array of chunk texts for a token-array column; starts at 1,
    * 1+stride, ... (>= 1 chunk always). Starts are capped at
    * n - overlap: a start beyond that yields a tail chunk fully
    * contained in the previous one (pure duplicate training text),
    * and the last admitted start still reaches token n because it
    * exceeds n - chunkTokens. */
  private def chunkArray(toks: Column, chunkTokens: Int, overlap: Int,
                         stride: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - overlap, lit(1)),
        lit(stride)),
      s => array_join(slice(toks, s, lit(chunkTokens)), " "))

  /** Explode `docs` into (id, chunk_idx, chunk, n_chunk_tokens) rows.
    *
    * Empty/null text emits ONE empty chunk with n_chunk_tokens = 1 —
    * deliberately mirroring the engine-wide whitespace-token count
    * (`split("", " ")` = [""], so `size(tokens(""))` is 1 everywhere:
    * token budgets, packing, stats). Filter empty docs upstream if
    * they must not occupy a chunk; changing only this operator to 0
    * would desync it from every other token accounting.
    *
    * @param overlap tokens shared between consecutive chunks
    *                (0 <= overlap < chunkTokens).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol),
        posexplode(chunkArray(
          TextAnalysis.tokens(coalesce(col(textCol), lit(""))),
          chunkTokens, overlap, stride)).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"),
        size(split(col("chunk"), " ")).cast("long").as("n_chunk_tokens"))
  }
}
