package graft.operators

import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared fail-fast type guards: ONE definition of "integral column"
  * for every operator that keys on it (ANN ids, sample weights), so
  * the admitted type set cannot drift between call sites.
  */
private[graft] object Guards {

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  /** Require a resolved integral type. `role` names the column's job
    * in the error ("id ('vec_id')", "weight"); `why` is the
    * operator's own explanation of what silent failure the guard
    * prevents. */
  def requireIntegral(dt: DataType, opName: String, role: String,
                      why: String): Unit =
    require(integralTypes.contains(dt),
      s"$opName requires an integral $role column " +
        s"(got ${dt.simpleString}): $why")
}
