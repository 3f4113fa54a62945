package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank (distributed ntile/percent_rank/cume_dist) must agree
  * bit-for-bit with Spark's single-partition window functions — across
  * sizes that exercise the uneven-tile remainder branch (n % k != 0),
  * duplicate order-key values straddling bucket boundaries, and
  * negative keys — while keeping the data out of any single-partition
  * exchange.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def referenceAndRanked(n: Int, k: Int) = {
    // deterministic values with many duplicates (xs % 37) so bucket
    // boundaries land inside runs of equal keys; id uniquifies order
    val df = (0 until n).map(i => (i.toLong, ((i * 2654435761L) % 37 - 5).toDouble))
      .toDF("id", "v")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expected = df.select(col("id"),
      ntile(k).over(w).cast("long").as("q"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
    val ranked = GlobalRank.withGlobalRank(df, floor(col("v")),
        Seq(col("v").asc, col("id").asc))
      .select(col("id"),
        GlobalRank.ntileOf(col("__rank"), col("__n"), k).as("q"),
        GlobalRank.percentRankOf(col("__rank"), col("__n")).as("pr"),
        GlobalRank.cumeDistOf(col("__rank"), col("__n")).as("cd"))
    (expected, ranked)
  }

  test("matches window ntile/percent_rank/cume_dist incl. remainder tiles") {
    for ((n, k) <- Seq((1, 4), (3, 4), (7, 3), (100, 7), (1003, 4),
                       (50, 50), (10, 100))) {
      val (expected, ranked) = referenceAndRanked(n, k)
      val diff = expected.except(ranked).count() +
        ranked.except(expected).count()
      assert(diff == 0, s"mismatch for n=$n k=$k")
    }
  }

  test("null order keys are ranked, not dropped (null-safe bucket join)") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)),
        (4L, None), (5L, Some(9.0)))
      .toDF("id", "v")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expected = df.select(col("id"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .as[(Long, Double, Double)].collect().toSet
    val got = GlobalRank.withGlobalRank(df, floor(col("v")),
        Seq(col("v").asc, col("id").asc))
      .select(col("id"),
        GlobalRank.percentRankOf(col("__rank"), col("__n")).as("pr"),
        GlobalRank.cumeDistOf(col("__rank"), col("__n")).as("cd"))
      .as[(Long, Double, Double)].collect().toSet
    assert(got.size == 5, "rows with null order keys must survive")
    assert(got == expected) // nulls-first rank identical to the window
  }

  test("no single-partition exchange touches the data relation") {
    val (_, ranked) = referenceAndRanked(1000, 4)
    val plan = ranked.queryExecution.executedPlan.toString
    // The plan's only SinglePartition exchange must feed the window
    // over the BUCKET-COUNT aggregate (rows = #buckets), never the
    // input rows; the data-side window partitions by bucket.
    val single = "Exchange SinglePartition".r
      .findAllIn(plan).length
    assert(single == 1, s"expected exactly 1 tiny-side exchange:\n$plan")
    assert(plan.contains("hashpartitioning(__b"),
      s"data window must be bucket-partitioned:\n$plan")
  }
}
