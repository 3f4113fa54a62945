package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: the scale path for theta joins whose predicate
  * bounds the distance between two numeric columns —
  * `rightVal ∈ [leftVal - width, leftVal + width]` (and any extra
  * residual predicate on top).
  *
  * Spark plans an unbounded theta join as BroadcastNestedLoopJoin —
  * O(|L|·|R|) work regardless of how few pairs survive. Banding maps
  * both sides onto `floor(val / width)` blocks; a right row in block b
  * can only match left rows in blocks {b-1, b, b+1}, so replicating
  * the right side into its three neighbour blocks turns the join into
  * an EQUI-join on the block id (hash-partitioned, shuffle on
  * well-spread keys) followed by the exact predicate as a filter.
  * Intermediate size is O(pairs within ±width bands), never |L|·|R|;
  * the 3× replication of the right side is the bounded price.
  *
  * Same banding idea as Dedup.bandedPairs, generalized from id-gap
  * self-joins to arbitrary two-table numeric range predicates.
  */
object RangeJoin {

  /** Join where `cond` holds AND |left(lCol) - right(rCol)| <= width.
    * `cond` receives the joined frame and must reference columns via
    * their (unambiguous) names.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
                      lCol: String, rCol: String,
                      width: Double, cond: Column): DataFrame = {
    require(width > 0, "width must be positive")
    val lB = left.withColumn("__blk", floor(col(lCol) / width))
    val rB = right.withColumn("__blk",
      explode(array(floor(col(rCol) / width) - 1,
        floor(col(rCol) / width),
        floor(col(rCol) / width) + 1)))
    lB.join(rB, Seq("__blk"))
      .filter(abs(col(lCol) - col(rCol)) <= width && cond)
      .drop("__blk")
  }
}
