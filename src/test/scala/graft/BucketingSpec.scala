package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

/** Proves the co-located join claim the scale docs make: two tables
  * bucketed by the join key plan a sort-merge join with ZERO
  * exchanges — the shuffle is paid once at write time and never
  * again.
  */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables plans no exchange") {
    val sf = "/root/testdata/sf0.001"
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "customer"), "cust_bkt", 4,
        Seq("c_custkey"))
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "orders")
          .withColumnRenamed("o_custkey", "c_custkey"), "ord_bkt", 4,
        Seq("c_custkey"))
      val joined = spark.table("cust_bkt")
        .join(spark.table("ord_bkt"), "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      // the join itself is exchange-free; the only exchange allowed
      // in the whole plan is the groupBy's (4-bucket -> segment keys)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result is the same as the plain (shuffled) join
      val plain = Tables.load(spark, sf, "customer")
        .join(Tables.load(spark, sf, "orders"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("c_mktsegment").collect().toSeq ==
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
