package graft.operators

/** Driver-side overlap of INDEPENDENT Spark actions (guide §2.6:
  * "actions are only sequential because your driver code calls them
  * sequentially"). A multi-table index create, a multi-surface audit
  * build, or a multi-count verdict row is a chain of small jobs, each
  * with a straggler tail that leaves most executors idle; submitting
  * them from a bounded pool lets the next job's tasks back-fill the
  * freed slots. Used ONLY where the actions are provably independent
  * (different output tables/paths, or pure counts over already-staged
  * state) — never to reorder writes a later read depends on.
  *
  * Failure semantics: ALL thunks are awaited to completion (each
  * wrapped in Try), then the FIRST failure — in input order — is
  * rethrown. Waiting out the stragglers matters: rethrowing while
  * sibling writes are still committing would let a caller's
  * cleanup/retry (drop table, fs delete) race zombie commits for the
  * same locations — the sequential semantics callers rely on is
  * "when this returns or throws, nothing is still running".
  *
  * SHARED-LINEAGE CONTRACT (found as a torn-row corruption in r17's
  * IVF-table spec): two thunks must NOT consume DataFrames that share
  * an UNCACHED, UNCHECKPOINTED logical subtree. Concurrent
  * optimization of both plans can run ConvertToLocalRelation over the
  * SAME expression instances, and interpreted higher-order functions
  * keep their lambda slots in the expression instance — two driver
  * threads evaluating them at once interleave rows (manifest when the
  * shared input is a LocalRelation, i.e. any in-memory fixture).
  * Safe sharing: persisted frames (cache-substituted at plan time),
  * localCheckpointed frames (LogicalRDD), catalog tables, parquet
  * scans. For an empty schema seed use [[emptyLike]], never
  * `df.limit(0)`.
  */
object Concurrent {

  /** An EMPTY frame with `df`'s schema that shares NO logical subtree
    * with `df` — the safe "schema seed" for a parallel write group.
    * `df.limit(0)` keeps the full plan underneath, and two
    * concurrently-optimized plans over shared expression instances
    * race in ConvertToLocalRelation's driver-side interpreted
    * evaluation (instance-held lambda slots in higher-order
    * functions) — torn rows when the shared input is a LocalRelation.
    * Schema access below only ANALYZES `df` (no evaluation). */
  def emptyLike(df: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
  }

  /** Run each thunk on its own pooled thread and wait for all;
    * returns results in input order. `parallelism` bounds in-flight
    * jobs (2-4 is plenty: enough to fill stage tails, not so many
    * that tiny jobs fight for executors — guide §2.6). */
  def inParallel[T](thunks: Seq[() => T], parallelism: Int = 4): Seq[T] = {
    require(parallelism >= 1, s"parallelism must be >= 1: $parallelism")
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // Try-wrapped so a failure never leaves siblings in flight:
      // every future runs to completion before the first error (in
      // input order) is rethrown — see the failure-semantics note
      val fs = thunks.map(t =>
        scala.concurrent.Future(scala.util.Try(t())))
      val done = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
      done.map(_.get)
    } finally {
      pool.shutdown(); ()
    }
  }
}
