package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: geometric mean = exp(mean(ln(x))) over positive doubles.
  * Demonstrates the engine's custom-aggregate surface (the reference has
  * none — SURVEY.md §2B q_agg_udaf). Partial aggregation (map-side
  * combine) comes for free from the Aggregator contract: `reduce` runs
  * per partition, `merge` combines partials, so the shuffle carries one
  * (sum, count) pair per group per partition — scale-safe.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
