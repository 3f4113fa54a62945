package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact frequent-items ("heavy hitters") at corpus scale.
  *
  * The naive plan — groupBy(token).count().filter(cnt·k > n) —
  * shuffles every distinct token; on a 100 TB corpus that is billions
  * of grouping keys for an answer of at most k rows. Instead:
  *
  *  1. A Misra-Gries summary (budget k) per partition. MG guarantees
  *     any item with partition count > n_p/k survives the partition's
  *     summary; by pigeonhole any item with GLOBAL count > n/k exceeds
  *     the threshold in at least one partition, so the union of
  *     per-partition candidates is a superset of the true answer.
  *     Map-only, O(k) state per task, ≤ P·k candidate rows emitted.
  *  2. Exact recount of candidates only: broadcast the candidate set,
  *     hash-aggregate just those tokens (partial map-side combine on
  *     ≤ P·k distinct keys), keep cnt·k > n.
  *
  * Total shuffle: O(P·k) rows regardless of corpus vocabulary. The
  * result is EXACT (the sketch only prunes, never decides), so it
  * oracle-checks against the naive SQL.
  */
object HeavyHitters {

  /** Misra-Gries: items whose count in `it` MAY exceed total/k.
    * Classic decrement-all summary with ≤ k-1 live counters. */
  private[graft] def mgCandidates(it: Iterator[String],
                                  k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k - 1 => counters.update(x, 1L)
        case None =>
          // decrement-all; drop zeros (amortized O(1) per input item).
          // Snapshot keys first: mutating a HashMap mid-iteration is
          // undefined.
          counters.keys.toArray.foreach { key =>
            val c = counters(key)
            if (c == 1L) counters.remove(key) else counters.update(key, c - 1)
          }
      }
    }
    counters.keysIterator
  }

  /** Tokens of `col(colName)` in `tokens` whose global count strictly
    * exceeds total/k, with exact counts. Integer-math threshold
    * (cnt·k > n) so any engine reproduces the cut identically. */
  def exactHeavyHitters(tokens: DataFrame, colName: String,
                        k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    val candidates = tokens.select(col(colName).cast("string"))
      .as[String]
      .mapPartitions(it => mgCandidates(it, k))
      .toDF(colName)
      .distinct()
    val total = tokens.agg(count(lit(1)).as("n_total"))
    tokens.select(col(colName))
      .join(broadcast(candidates), colName)
      .groupBy(colName)
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_total"))
      .select(col(colName), col("cnt"))
  }
}
