package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * matching key and right.time <= left.time. Spark has no native as-of
  * operator; this composes an equi-join on the key (so it plans as a
  * broadcast or shuffled hash/sort-merge join — NOT a cartesian) with a
  * per-left-row `row_number` survivor pick.
  *
  * Scale note: the join shuffles both sides on the key once; the window
  * partitions by the left row id, which is unique, so the second shuffle
  * spreads perfectly. For extreme per-key fan-out (many right rows per
  * key), bucket the right side by key and time-range-prune before the
  * join; that refinement keeps the same logical shape.
  */
object AsOfJoin {

  /** Left as-of join. Output = all left columns, plus the matched right
    * columns (null when no right row qualifies).
    *
    * @param tiebreak right-side columns that uniquify rows with equal
    *                 time, so the survivor is deterministic.
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tiebreak: Seq[String]): DataFrame = {
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val cond = l(leftKey) === right(rightKey) &&
      right(rightTime) <= l(leftTime)
    val joined = l.join(right, cond, "left")
    // Survivor pick via max_by instead of a row_number window: the
    // aggregate combines map-side (partial max per partition), so the
    // shuffle carries one row per left row instead of every joined
    // pair — the window form sorts the full pair set. Lexicographic
    // struct max on (rightTime, tiebreak...) = "latest, deterministic".
    val ordKey = struct((rightTime +: tiebreak).map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val leftKeys: Seq[Column] = col("__lid") +: left.columns.map(col).toSeq
    joined
      .groupBy(leftKeys: _*)
      .agg(max_by(rStruct, ordKey).as("__r"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__r.$c").as(c)): _*)
  }
}
