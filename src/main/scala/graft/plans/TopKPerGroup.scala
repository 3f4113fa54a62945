package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator Catalyst extension (SURVEY.md §7.3 ladder rung (c)):
  * bounded top-k per group as a first-class plan node.
  *
  * The stock formulation — `row_number().over(partitionBy(g).orderBy(o))
  * <= k` — must SORT every group in full before discarding all but k
  * rows. This operator keeps a size-k heap per group instead:
  * O(n log k) with memory O(groups·k) per partition, no per-group sort
  * of the long tail. At 100 TB, "top 3 orders per customer" sorts
  * nothing but the 3-row heaps.
  *
  * Wiring: logical marker node → planner strategy → a PARTIAL physical
  * exec (no distribution requirement — heaps run inside each input
  * partition, bounding what the shuffle carries at groups·k rows per
  * partition, the aggregation partial-combine shape) under a FINAL exec
  * that declares `ClusteredDistribution(group)` so Spark inserts exactly
  * one hash exchange between them (or none over bucketed input).
  * Top-k of per-partition top-k is the global top-k, so the final pass
  * is the same heap code over the partials. Injected per-session via
  * `experimental.extraStrategies` (public API) and at builder time by
  * [[graft.GraftExtensions]].
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
                            order: Seq[SortOrder], child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan)
  : LogicalPlan = copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, group, order, child) =>
      TopKPerGroupExec(k, group, order, partial = false,
        TopKPerGroupExec(k, group, order, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            order: Seq[SortOrder], partial: Boolean,
                            child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  // the partial pass accepts any layout (it only bounds per-partition
  // state); the final pass demands co-located groups, so the planner
  // inserts the single hash exchange between the two. With NO group
  // columns the "group" is the whole input, so the final pass needs
  // every partial in one place (AllTuples) — under the old
  // UnspecifiedDistribution no exchange was inserted and the operator
  // silently returned per-partition top-k instead of global top-k
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = GenerateOrdering.generate(orderE, childOutput)
      // max-heap of the current k best: head = worst kept row
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1,
            ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) =>
        val group = new Array[InternalRow](heap.size)
        var i = group.length - 1
        while (i >= 0) { group(i) = heap.poll(); i -= 1 }
        out ++= group // ascending rank order within the group
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKPerGroup {
  /** Public entry: top `k` rows per `groupCols` group under
    * `orderCols` ((name, ascending)); include a unique tiebreak column
    * for deterministic output. */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k (the exec's heap " +
      "compares against peek(), which is null on an empty heap)")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val analyzed = df.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive by
    // default, like every built-in operator) and reject ambiguity
    // instead of silently binding the first duplicate name
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String) = {
      val hits = analyzed.output.filter(a => resolver(a.name, n))
      require(hits.size == 1,
        if (hits.isEmpty) s"no column $n" else s"ambiguous column $n")
      hits.head
    }
    // grouping on float/double keys would need the analyzer's
    // NormalizeFloatingNumbers treatment (-0.0 == 0.0, one NaN),
    // which only rewrites the stock Window/Aggregate nodes — raw
    // UnsafeRow key bytes here would split those groups. Reject
    // rather than silently diverge from the window formulation.
    groupCols.foreach { n =>
      val dt = attr(n).dataType
      require(dt != org.apache.spark.sql.types.DoubleType &&
          dt != org.apache.spark.sql.types.FloatType,
        s"TopKPerGroup group column $n is $dt: floating-point group " +
          "keys are not supported (byte-wise grouping would split " +
          "-0.0/0.0 and NaN bit patterns); bucket or cast first")
    }
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(k, groupCols.map(attr), order, analyzed))
  }
}
