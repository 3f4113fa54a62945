package graft

import org.apache.spark.sql.Row

/** q_agg_percentile_approx is rows-only at the oracle (sketch output is
  * engine-specific); this spec bounds its error against the exact form
  * and checks the plan never buffers whole groups.
  */
class PercentileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def byFlag(rows: Array[Row]): Map[String, Seq[Double]] =
    rows.map(r => r.getString(0) ->
      Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

  test("approx percentiles track exact percentiles within tolerance") {
    val exact = byFlag(
      queries.RelationalQueries.queries("q_agg_percentile")(spark, sf)
        .collect())
    val approx = byFlag(
      queries.RelationalQueries.queries("q_agg_percentile_approx")(
        spark, sf).collect())
    assert(exact.keySet == approx.keySet)
    for ((flag, es) <- exact; (e, a) <- es.zip(approx(flag))) {
      // accuracy=10000 -> rank error <= n/10000; at sf0.001 that is
      // sub-ulp on the quantity percentiles, but exact percentile
      // interpolates between neighbours while the sketch returns a
      // sample point — allow the gap between adjacent order stats.
      val tol = math.max(1e-6, math.abs(e) * 0.02)
      assert(math.abs(e - a) <= tol,
        s"$flag: exact $e vs approx $a exceeds tolerance $tol")
    }
  }

  test("approx form aggregates with bounded per-group state") {
    val plan = queries.RelationalQueries
      .queries("q_agg_percentile_approx")(spark, sf)
      .queryExecution.executedPlan.toString
    // partial (map-side) aggregation of the sketch must be present —
    // that is what keeps group size from bounding executor memory.
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate") || plan.contains("HashAggregate"))
    assert(plan.contains("partial_approx_percentile") ||
      plan.toLowerCase.contains("partial"))
  }
}
