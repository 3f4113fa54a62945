package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * matching key and right.time <= left.time. Spark has no native as-of
  * operator; this composes an equi-join on the key (so it plans as a
  * broadcast or shuffled hash/sort-merge join — NOT a cartesian) with a
  * per-left-row `row_number` survivor pick.
  *
  * Scale note: the join shuffles both sides on the key once; the
  * survivor-pick aggregate groups by the (unique) left row key, so its
  * shuffle spreads perfectly and combines map-side. For extreme
  * per-key fan-out (many right rows per key), bucket the right side by
  * key and time-range-prune before the join; that refinement keeps the
  * same logical shape.
  */
object AsOfJoin {

  /** Left as-of join. Output = all left columns, plus the matched right
    * columns (null when no right row qualifies).
    *
    * @param tiebreak right-side columns that uniquify rows with equal
    *                 time, so the survivor is deterministic.
    * @param leftId   columns that uniquify LEFT rows (the group key of
    *                 the survivor pick). Must be deterministic —
    *                 `monotonically_increasing_id` would recompute
    *                 differently under partial stage retry
    *                 (SPARK-23207), silently merging or splitting
    *                 groups. When omitted, exact duplicate left rows
    *                 are counted before the join and re-expanded after
    *                 the survivor pick (one extra distinct-shuffle of
    *                 the left side); pass the actual unique key when
    *                 you have one to skip that pre-aggregation.
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tiebreak: Seq[String],
               leftId: Seq[String] = Seq.empty): DataFrame = {
    // Without a unique leftId, exact duplicate left rows are
    // pre-aggregated with their multiplicity (deterministic — unlike
    // a synthetic row id) and re-expanded after the survivor pick, so
    // output cardinality always equals the left side's.
    val l =
      if (leftId.nonEmpty) left.withColumn("__lmult", lit(1L))
      else left.groupBy(left.columns.toIndexedSeq.map(col): _*)
        .agg(count(lit(1)).as("__lmult"))
    val cond = l(leftKey) === right(rightKey) &&
      right(rightTime) <= l(leftTime)
    val joined = l.join(right, cond, "left")
    // Survivor pick via max_by instead of a row_number window: the
    // aggregate combines map-side (partial max per partition), so the
    // shuffle carries one row per left row instead of every joined
    // pair — the window form sorts the full pair set. Lexicographic
    // struct max on (rightTime, tiebreak...) = "latest, deterministic".
    // Every post-join reference is dataframe-QUALIFIED (right(...) /
    // l(...)): the natural as-of call has the same key/time column
    // names on both sides, and unqualified col() would die with
    // AMBIGUOUS_REFERENCE there.
    val ordKey = struct((rightTime +: tiebreak).map(right(_)): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(right(_)): _*)
    // Group by the caller's unique left key plus the remaining left
    // payload (constant within a group, carried through the grouping
    // so no second join is needed to re-attach it).
    val idCols = if (leftId.nonEmpty) leftId else left.columns.toSeq
    val leftKeys: Seq[Column] =
      (idCols ++ left.columns.filterNot(idCols.contains) :+ "__lmult")
        .map(l(_))
    joined
      .groupBy(leftKeys: _*)
      .agg(max_by(rStruct, ordKey).as("__r"))
      .select(explode(sequence(lit(1L), col("__lmult"))).as("__i") +:
        left.columns.toIndexedSeq.map(col) ++:
        right.columns.toIndexedSeq.map(c => col(s"__r.$c").as(c)): _*)
      .drop("__i")
  }
}
