import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.floor

package object graft {
  /** A registered query: (session, sf-dir) => result. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** Deterministic cross-engine rounding: floor(x*10^d + 0.5)/10^d,
    * computed in IEEE double on BOTH engines, so results are
    * bit-identical between Spark and the DuckDB oracle. Spark's own
    * `round()` re-parses the double's shortest decimal representation
    * (BigDecimal.valueOf) and HALF_UPs it, which disagrees with
    * DuckDB's binary-value rounding roughly once per 10^5 values.
    */
  def rnd(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }
}
