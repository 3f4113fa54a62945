package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual complement to AQE's
  * skew-join splitting, for when a single key dominates so heavily
  * that even split shuffle blocks land on one reducer chain).
  *
  * Left rows get a deterministic salt in [0, buckets) derived from a
  * unique column (NOT `rand()` — retries must reproduce the same
  * partitioning); the right side is replicated `buckets` times. The
  * join key becomes (key, salt), spreading one hot key over `buckets`
  * reducers at the cost of a bounded right-side blow-up — the standard
  * trade when the right side is the small-but-not-broadcastable one.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     saltSource: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
