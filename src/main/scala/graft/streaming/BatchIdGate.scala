package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Durable batch-id gate for idempotent side effects inside
  * `foreachBatch` — the concrete form of the "gate the append on
  * batchId" replay contract the index appends document
  * ([[graft.operators.Dedup.appendToBandedIndex]],
  * `Similarity.appendTo*Index`). Spark's streaming checkpoint
  * guarantees each batchId is REDELIVERED after a crash, not that the
  * caller's side effects ran once; this gate records the last batchId
  * whose side effects completed, so a redelivered batch can skip them.
  *
  * Usage inside the ingest loop:
  * {{{
  *   val gate = new BatchIdGate(s"$ckpt/graft-applied")
  *   ...foreachBatch { (batch, batchId) =>
  *     val admitted = StreamingOps.ingestDoor(batch, ...)
  *     admitted.write.mode("append").parquet(corpusDir)
  *     if (gate.isNew(batchId)) {
  *       digests = Dedup.appendToDigestIndex(digests, admitted, "text")
  *       ...
  *       gate.commit(batchId)
  *     }
  *   }
  * }}}
  *
  * Semantics are apply-then-commit: a crash BETWEEN the side effect
  * and `commit` replays the side effect once more — at-least-once
  * with a one-batch window, exactly the MQ source's
  * commit-after-checkpoint stance on the other side of the pipeline.
  * For the index appends that degradation is benign by design
  * (duplicated digest/band rows are invisible to the LEFT ANTI
  * probes; duplicated ANN rows are cleared by the next rebuild);
  * side effects needing true exactness must be transactional WITH the
  * batchId (e.g. overwrite a partition named by it), at which point
  * this gate is just the fast-path skip.
  *
  * The record is one file holding the last committed batchId, written
  * via temp-file + atomic rename (the `FileMQTransport.committed`
  * pattern); reads tolerate a missing file (fresh checkpoint = every
  * batch is new). Driver-side only — `foreachBatch` bodies run on the
  * driver, so no distributed coordination is needed.
  */
final class BatchIdGate(path: String) {

  private val file = Paths.get(path)

  /** Last committed batchId, or -1 when nothing committed yet. */
  def lastCommitted(): Long =
    if (Files.exists(file))
      new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
        .trim.toLong
    else -1L

  /** True iff `batchId`'s side effects have not been committed —
    * batchIds are monotone per checkpoint, so "new" is a simple
    * greater-than on the stored watermark. */
  def isNew(batchId: Long): Boolean = batchId > lastCommitted()

  /** Record `batchId` as applied. Atomic rename, so a crash
    * mid-commit leaves the previous record intact (the batch replays
    * — at-least-once, never lost). Out-of-order commits are rejected:
    * regressing the watermark would re-open every later batch. */
  def commit(batchId: Long): Unit = {
    require(batchId > lastCommitted(),
      s"commit($batchId) would regress the gate past " +
        s"${lastCommitted()} — batchIds are monotone per checkpoint")
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp,
      batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
