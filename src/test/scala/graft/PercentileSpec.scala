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

/** q_agg_stats derives stddev/variance/correlation from exact decimal
  * moment sums (order-independent, so cross-engine and cross-
  * partitioning deterministic); this spec pins the closed form to
  * Spark's native statistical aggregates within float tolerance.
  */
class AggStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("moment-sum stats match native stddev/var/corr") {
    import org.apache.spark.sql.functions._
    val got = queries.RelationalQueries.queries("q_agg_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val want = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd_q"),
        var_samp(col("l_quantity")).as("v_q"),
        stddev_samp(col("l_extendedprice")).as("sd_p"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((flag, (sdq, vq, sdp, c)) <- got) {
      val (wsdq, wvq, wsdp, wc) = want(flag)
      // tolerance = the query's OWN rounding half-quantum (1e-6 cols
      // round at 1e-6 -> 5e-7; stddev_price rounds at 1e-4 -> 5e-5)
      // plus float slack — the native aggregate is NOT on that grid,
      // so comparing tighter than the quantum is flaky by design
      def close(a: Double, b: Double, quantum: Double) =
        math.abs(a - b) <= quantum / 2 + math.abs(b) * 1e-9
      assert(close(sdq, wsdq, 1e-6) && close(vq, wvq, 1e-6) &&
        close(sdp, wsdp, 1e-4) && close(c, wc, 1e-6),
        s"$flag: $sdq/$vq/$sdp/$c vs $wsdq/$wvq/$wsdp/$wc")
    }
  }

  test("unpivot is the exact inverse shape of the wide projection") {
    val long = queries.RelationalQueries.queries("q_unpivot")(spark, sf)
    val n = Tables.load(spark, sf, "customer").count()
    assert(long.count() == 2 * n)
    // map-only: the ONLY exchange in the whole plan is the final
    // orderBy's range partitioning — any second one means the unpivot
    // itself shuffled (an index comparison against "Sort" would be
    // vacuous: the topmost Sort always prints before its exchange)
    val plan = long.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "unpivot should plan an Expand node")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"unpivot must not add a shuffle beyond the final sort:\n$plan")
  }
}
