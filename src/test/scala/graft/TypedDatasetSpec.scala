package graft

import java.sql.Timestamp

/** Typed Dataset[T] surface (SURVEY.md §1.4: case-class Encoders where
  * type safety helps): the parquet tables bind to case classes and
  * compose with typed transforms + the typed Aggregator. */
class TypedDatasetSpec extends SparkSpec {
  import spark.implicits._

  test("orders bind to a case class; typed transforms + Aggregator compose") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .as[TypedDatasetSpec.Order]
    val bigUrgent = orders
      .filter(o => o.o_totalprice > 100000 &&
        o.o_orderpriority.startsWith("1"))
      .map(o => (o.o_custkey, o.o_totalprice))
    assert(bigUrgent.count() > 0)
    // typed groupByKey -> mapValues -> the same typed Aggregator that
    // backs q_agg_udaf
    val geo = orders.groupByKey(_.o_orderstatus)
      .mapValues(_.o_totalprice)
      .agg(graft.functions.GeometricMean.toColumn.name("geo"))
      .collect().toMap
    assert(geo.keySet == Set("F", "O", "P"))
    assert(geo.values.forall(v => v > 0 && !v.isNaN))
  }
}

object TypedDatasetSpec {
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: Timestamp,
                   o_orderpriority: String)
}
