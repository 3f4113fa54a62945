package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-budgeting operators: per-group caps (domain balancing) and
  * global token budgets (fixed-size ablation cuts). Both are
  * deterministic — membership is a pure function of the row, never of
  * partitioning — so cuts reproduce across engines and reruns.
  */
object Budget {

  /** Cap each group at `cap` rows, keeping a deterministic
    * hash-ordered sample (salted so the kept set is independent of
    * other hash-bucket uses of the id). The C4/RefinedWeb "no domain
    * may dominate" balancing step.
    *
    * Shape: two-phase. A group-count aggregate (map-side combined,
    * one row per group) finds groups over `cap · preThinFactor`; rows
    * of those groups are PRE-THINNED by a threshold on the leading 32
    * bits of the SAME salted order hash — thresholding a prefix of
    * the hash keeps a strict prefix of the exact keep-order, so the
    * exact row_number window that finishes the job sees an expected
    * `cap · preThinFactor` rows per hot group instead of the full
    * group in one task (the mega-domain that used to be this
    * operator's scale escape hatch). A hot group whose thinned
    * survivor count dips below `cap` (binomially unlikely at the
    * default 8× margin, but possible) is RESCUED through the exact
    * one-phase window over its full rows, so the result is
    * bit-identical to the one-phase form for every input — the
    * pre-thin is a transport optimization, never a semantics change.
    * When no group is over the pre-thin bar, the plan IS the
    * one-phase window plus one tiny aggregate.
    *
    * Precondition for the bit-identical claim (and for the
    * determinism contract itself): the keep order (salted hash, id)
    * must be TOTAL within each group — `idCol` unique, at most one
    * NULL id per group. Rows TIED on both keys (duplicate ids, or
    * 2+ NULL-id rows straddling the cap) get row_number positions in
    * partition-arrival order, so which of them is kept is arbitrary
    * in the ONE-phase form too — the same total-order requirement
    * [[takeWeightBudget]] documents for its running sum.
    *
    * @param preThinFactor expected survivors per hot group =
    *        `cap · preThinFactor`; higher = smaller rescue
    *        probability, more rows through the exact window.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  cap: Int, preThinFactor: Int = 8): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(preThinFactor >= 2,
      s"preThinFactor must be >= 2, got $preThinFactor")
    require(Seq("__rn", "__n", "__g", "__thr", "__s", "__g2")
        .forall(c => !df.columns.contains(c)),
      "input already has a __rn/__n/__g/__thr/__s/__g2 column")
    val orderHash = md5(concat(col(idCol).cast("string"), lit(":cap")))
    def exactCap(in: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(orderHash, col(idCol))
      in.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= cap)
        .drop("__rn")
    }
    val target = cap.toLong * preThinFactor.toLong
    // ONE corpus aggregate, materialized tiny (a row per HOT group)
    // and persisted so the thin/survivor/rescue consumers reuse it
    // instead of re-running the corpus groupBy per consumer
    // (lifecycle: session clearCache, the tf-table stance). The
    // threshold is computed in DOUBLE: target/n < 1 by the hot
    // filter, so 2^32·(target/n) never overflows — the integer form
    // (2^32 · target) wraps (or throws under ANSI) once
    // cap·preThinFactor > 2^31; a ±1-ulp rounding difference only
    // moves the heuristic bar, which the rescue path covers
    val thr = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > target)
      .select(col(groupCol).as("__g"),
        (floor(lit(4294967296.0d) *
            (lit(target).cast("double") / col("__n"))).cast("long")
          + lit(1L)).as("__thr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (thr.isEmpty) { thr.unpersist(); return exactCap(df) }
    // leading 32 bits of the order hash as a uniform integer: the
    // md5 hex string is fixed-length lowercase, so its lexicographic
    // (= keep) order is the numeric order of the 128-bit value, and
    // a threshold on the first 8 hex chars keeps a strict prefix.
    // A NULL-id row has a NULL hash, and the exact window's
    // (hash asc, id asc) keep order puts NULLS FIRST — such rows are
    // the HEAD of every keep prefix, so the pre-thin keeps them
    // unconditionally or the two forms would diverge on hot groups
    val bucket32 = conv(substring(orderHash, 1, 8), 16, 10).cast("long")
    val thinned = df
      .join(broadcast(thr), col(groupCol) <=> col("__g"), "left")
      .filter(col("__thr").isNull || bucket32.isNull ||
        bucket32 < col("__thr"))
    // rescue guard: every hot group must keep >= cap survivors for
    // the prefix argument to finish exactly (hot means |group| >
    // target >= 2·cap, so min(cap, |group|) = cap); a group that
    // missed the bar — including one with ZERO survivors, hence the
    // left join from `thr` — re-runs through the one-phase window
    // over its full rows. `rescue` is tiny (⊆ hot groups): persist
    // it and branch on emptiness, so the common no-rescue run is
    // 3 corpus scans total (threshold agg, survivor agg, main
    // window) and never pays the rescued-side scan
    val surv = thinned.filter(col("__thr").isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__s"))
    val rescue = thr.select(col("__g").as("__g2"))
      .join(surv, col("__g2") <=> col(groupCol), "left")
      .filter(coalesce(col("__s"), lit(0L)) < cap)
      .select(col("__g2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (rescue.isEmpty) {
      rescue.unpersist()
      return exactCap(thinned).drop("__g", "__thr")
    }
    val main = exactCap(
        thinned.join(broadcast(rescue), col(groupCol) <=> col("__g2"),
          "left_anti"))
      .drop("__g", "__thr")
    val rescued = exactCap(
      df.join(broadcast(rescue), col(groupCol) <=> col("__g2"),
        "left_semi"))
    main.unionByName(rescued)
  }

  /** Keep rows in priority order until the running total of
    * `weightCol` (e.g. token counts) exceeds `budget` — the "train on
    * the best N tokens" ablation cut.
    *
    * The running sum is distributed with the [[GlobalRank]] recipe:
    * per-bucket partial sums (tiny table), offsets via the only
    * unpartitioned window — over one row PER BUCKET, bounded
    * regardless of data volume — then a within-bucket running sum on
    * top of the bucket offset. `bucket` must be monotone
    * NON-DECREASING along `order` (equal order keys ⇒ same bucket).
    *
    * Output: input columns + `running` (inclusive prefix sum in
    * priority order). A row is kept iff its running total still fits
    * the budget, so the cut is exact to the row, not to the bucket.
    *
    * `order` must be a TOTAL order (append a unique id as the last
    * key, as `capPerGroup` does): rows tied on every order key get
    * running-sum positions in partition-arrival order, so the keep
    * verdict for ties straddling the budget boundary would otherwise
    * vary between runs — the determinism contract above only holds
    * for unique orderings.
    */
  def takeWeightBudget(df: DataFrame, weightCol: String, budget: Long,
                       bucket: Column, order: Seq[Column]): DataFrame = {
    // `running` is in the guard because it is the OUTPUT column:
    // withColumn would silently clobber a same-named input column
    require(Seq("__b", "__off", "__ob", "running")
        .forall(c => !df.columns.contains(c)),
      "input already has a __b/__off/__ob/running column")
    val b = df.withColumn("__b", bucket)
    val sums = b.groupBy(col("__b"))
      .agg(sum(col(weightCol)).as("__s"))
    val wOff = Window.orderBy(col("__b"))
    val offs = sums.select(
      col("__b"),
      coalesce(
        sum(col("__s")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("__off"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offs.withColumnRenamed("__b", "__ob")),
        col("__b") <=> col("__ob"))
      .withColumn("running", col("__off") + sum(col(weightCol)).over(wLoc))
      .filter(col("running") <= budget)
      .drop("__b", "__ob", "__off")
  }
}
