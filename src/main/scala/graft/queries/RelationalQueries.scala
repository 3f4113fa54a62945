package graft.queries

import graft.{QueryFn, Tables, rnd}
import graft.functions.GeometricMean
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The batch relational surface (SURVEY.md §2B: scans, projection,
  * filters, scalar functions, joins, aggregation, windows, sort/limit,
  * set ops). Every query ends in a total order with a unique tiebreak
  * and aliases every computed column, so the DuckDB oracle hash-matches
  * (§7.4 determinism rules). Doubles that pass through re-orderable
  * aggregation are summed as DECIMAL then cast back, or rounded.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Exact, order-independent double sum: sum as DECIMAL(30,6), emit
    * DOUBLE. Bit-identical between Spark and DuckDB. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  val queries: Map[String, QueryFn] = Map(
    "q_scan" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_scan_filter_pushdown" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") < 10 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_project" -> ((s, d) => {
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 4).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_filter_pred" -> ((s, d) => {
      t(s, d, "orders").filter(
        (col("o_orderstatus") === "F" || col("o_orderstatus") === "O") &&
          col("o_totalprice").between(10000, 150000) &&
          col("o_orderpriority").like("%URGENT%") &&
          col("o_custkey").isNotNull &&
          (col("o_orderkey") % 3).isin(0, 1))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    "q_string_funcs" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        levenshtein(col("p_brand"), lit("Brand#11")).cast("long")
          .as("brand_dist"),
        translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
        .orderBy("p_partkey")
    }),

    "q_date_funcs" -> ((s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate"))
          .cast("long").as("days_to_y2k"))
        .orderBy("o_orderkey")
    }),

    "q_math_funcs" -> ((s, d) => {
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        rnd(col("l_extendedprice"), 1).as("r1"),
        rnd(abs(col("l_discount") - 0.05), 4).as("a1"),
        ceil(col("l_quantity") / 7.0).as("c1"),
        floor(col("l_quantity") / 7.0).as("f1"),
        rnd(sqrt(col("l_extendedprice")), 4).as("s1"),
        rnd(log(col("l_extendedprice") + 1.0), 4).as("ln1"),
        rnd(pow(col("l_quantity"), 2.0), 4).as("p1"),
        pmod(col("l_orderkey"), lit(7)).as("m1"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_case_when" -> ((s, d) => {
      t(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("tier"))
        .orderBy("c_custkey")
    }),

    "q_json_funcs" -> ((s, d) => {
      // try_cast: a non-numeric $.k from a malformed producer reads
      // as NULL instead of killing the whole job under ANSI mode
      // (DuckDB TRY_CAST mirrors it)
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .orderBy("event_id")
    }),

    "q_array_funcs" -> ((s, d) => {
      // NULL text reads as the empty document (the engine-wide stance
      // documented at TextAnalysis.contentFingerprint): without the
      // coalesce, Spark's concat_ws renders a null slice as '' while
      // DuckDB's array_to_string propagates NULL
      val toks = split(coalesce(col("text"), lit("")), " ")
      t(s, d, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        array_contains(toks, "data").as("has_data"),
        concat_ws(",", slice(array_sort(toks), 1, 3)).as("first3"))
        .orderBy("doc_id")
    }),

    "q_map_funcs" -> ((s, d) => {
      // maps cannot hold a NULL key: coalesce in the GROUP key, so a
      // null event_type stratum lands under '' AND the map keys are
      // unique by construction (coalescing only at map-build time
      // would collide a real '' stratum with the null one —
      // DUPLICATE_MAP_KEY kills the job under the default policy)
      val counts = t(s, d, "events")
        .groupBy(col("user_id"),
          coalesce(col("event_type"), lit("")).as("event_type"))
        .agg(count(lit(1)).as("c"))
      counts.groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(
          col("event_type"), col("c")))).as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
          coalesce(element_at(col("m"), "error"), lit(0L)).as("errors"))
        // null user_id is a real group; pin its placement cross-engine
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // ---- joins ----

    "q_join_broadcast" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), rnd(dsum(col("c_acctbal")), 2)
          .as("bal"))
        .orderBy("r_name")
    }),

    "q_join_smj" -> ((s, d) => {
      // hint("merge"): at test SFs orders fits under the broadcast
      // threshold, but the operator this query declares is the
      // fact-to-fact sort-merge join a 100 TB run would need.
      t(s, d, "lineitem")
        .join(t(s, d, "orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(rnd(dsum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),

    "q_join_multiway" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(rnd(dsum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("n_name")
    }),

    "q_join_outer" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("o_key"),
          coalesce(col("o_totalprice"), lit(-1.0d)).as("o_price"))
        .orderBy("c_custkey", "o_key")
    }),

    "q_join_semi" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 350000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 350000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_theta" -> ((s, d) => {
      // Pure non-equi band join: supplier side is small -> Spark plans a
      // broadcast nested-loop join, the right physical choice here.
      val sup = t(s, d, "supplier")
      val cust = t(s, d, "customer")
      sup.join(cust, col("c_acctbal") > col("s_acctbal") &&
          col("c_acctbal") <= col("s_acctbal") + 1000)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_band"))
        .orderBy("s_suppkey")
    }),

    "q_join_theta_banded" -> ((s, d) => {
      // Same result as q_join_theta through the SCALE path: the range
      // predicate bounds |c - s| by 1000, so banding on
      // floor(acctbal/1000) turns the nested loop into a hash
      // equi-join on block id + an exact residual filter
      // (operators.RangeJoin). Oracle identical to q_join_theta's.
      graft.operators.RangeJoin.bandedRangeJoin(
          t(s, d, "supplier"), t(s, d, "customer"),
          "s_acctbal", "c_acctbal", width = 1000.0,
          cond = col("c_acctbal") > col("s_acctbal") &&
            col("c_acctbal") <= col("s_acctbal") + 1000)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_band"))
        .orderBy("s_suppkey")
    }),

    "q_join_asof" -> ((s, d) => {
      // As-of join inside events: each purchase matched to the latest
      // click of the same user at or before it.
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      graft.operators.AsOfJoin.leftAsOf(purchases, clicks,
          "user_id", "c_user_id", "ts", "c_ts", Seq("c_event_id"),
          leftId = Seq("event_id"))
        .select(col("event_id"),
          coalesce(col("c_event_id"), lit(-1L)).as("click_id"),
          coalesce(unix_micros(col("ts")) - unix_micros(col("c_ts")),
            lit(-1L)).as("gap_us"))
        .orderBy("event_id")
    }),

    "q_self_join" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, d, "events")
        .withColumn("rn", row_number().over(w))
      val prev = ev.select(col("user_id").as("p_user_id"),
        col("event_id").as("prev_id"), col("ts").as("p_ts"),
        col("rn").as("p_rn"))
      ev.join(prev, col("user_id") === col("p_user_id") &&
          col("rn") === col("p_rn") + 1)
        .select(col("event_id"), col("prev_id"),
          (unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("gap_us"))
        .orderBy("event_id")
    }),

    "q_join_skew_salted" -> ((s, d) => {
      // Salted skew join: lineitem spread over (s_suppkey, salt) so a
      // dominant supplier key fans across 8 reducers. The ORACLE is
      // the PLAIN join — result identity under salting is the
      // operator's whole contract.
      graft.operators.SkewJoin.saltedEquiJoin(
          t(s, d, "lineitem"), t(s, d, "supplier"),
          "l_suppkey", "s_suppkey", saltSource = "l_orderkey",
          buckets = 8)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_li"),
          rnd(sum(col("l_quantity").cast("decimal(30,6)"))
            .cast("double"), 2).as("sum_qty"))
        .orderBy("s_suppkey")
    }),

    // ---- aggregation ----

    "q_agg_hash" -> ((s, d) => aggHash(s, d)),

    "q_agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("d_parts"),
          rnd(sum_distinct(col("l_quantity")), 2).as("d_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    "q_agg_approx_distinct" -> ((s, d) => {
      t(s, d, "events").groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
    }),

    "q_agg_rollup" -> ((s, d) => {
      // rollup over a join: the DataFrame rollup API false-positives
      // Spark's ambiguous-self-join check here, so express via SQL
      // (identical logical plan: Expand + partial/final hash agg).
      t(s, d, "customer").createOrReplaceTempView("customer_ru")
      t(s, d, "nation").createOrReplaceTempView("nation_ru")
      s.sql("""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(c_mktsegment, 'ALL') AS segment,
               count(*) AS cnt,
               floor(CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 * 100.0D + 0.5D) / 100.0D AS bal
        FROM customer_ru JOIN nation_ru ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
        ORDER BY nation, segment""")
    }),

    "q_agg_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          rnd(dsum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("total"))
        .orderBy("status", "priority")
    }),

    "q_agg_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS qty,
               count(*) AS cnt
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status""")
    }),

    "q_agg_having" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"),
          rnd(dsum(col("o_totalprice")), 2).as("total"))
        .filter(col("cnt") >= 14)
        .orderBy("o_custkey")
    }),

    "q_agg_udaf" -> ((s, d) => {
      val geomean = udaf(GeometricMean)
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(rnd(geomean(col("l_extendedprice")), 2).as("geo_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // ---- window functions ----

    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy("s_nationkey")
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      t(s, d, "supplier").select(
        col("s_suppkey"), col("s_nationkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
        .orderBy("s_suppkey")
    }),

    "q_win_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events").select(
        col("event_id"),
        coalesce(lag(col("value"), 1).over(w), lit(-1.0d)).as("prev_val"),
        coalesce(lead(col("value"), 1).over(w), lit(-1.0d)).as("next_val"),
        rnd(col("value") - coalesce(lag(col("value"), 1).over(w),
          lit(0.0d)), 4).as("delta"),
        first(col("event_id")).over(w).as("first_ev"))
        .orderBy("event_id")
    }),

    "q_win_frame" -> ((s, d) => {
      val base = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val mov = base.rowsBetween(-2, Window.currentRow)
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // RANGE frame: peers (ties in the order key) are included —
      // deterministic without a tiebreak, and distinct from ROWS.
      val rng = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = col("o_totalprice").cast("decimal(30,6)")
      t(s, d, "orders").select(
        col("o_orderkey"),
        sum(dec).over(mov).cast("double").as("moving_sum"),
        sum(dec).over(run).cast("double").as("running_total"),
        sum(dec).over(rng).cast("double").as("range_total"))
        .orderBy("o_orderkey")
    }),

    "q_pivot" -> ((s, d) => {
      t(s, d, "events").groupBy("user_id")
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        // fill ONLY the pivot columns: a bare na.fill(0) would also
        // rewrite a NULL user_id group key to 0
        .na.fill(0L,
          Seq("click", "view", "purchase", "signup", "error"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    "q_unpivot" -> ((s, d) => {
      // wide→long melt (the inverse of pivot): a map-only Expand node,
      // no shuffle — each input row emits one row per value column, so
      // it streams at any scale. Values are cast to one common type
      // first (unpivot requires it), ids stay as-is.
      t(s, d, "customer")
        .select(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "value")
        .orderBy("c_custkey", "metric")
    }),

    "q_agg_stats" -> ((s, d) => {
      // Statistical aggregates (stddev / variance / correlation) from
      // EXACT decimal moment sums: built-in stddev/corr accumulate
      // doubles whose merge order differs between engines (and between
      // partitionings!), so the result would not hash-match — and at
      // scale would not even reproduce run-to-run. Decimal sums of
      // x, x², xy are order-independent and map-side-combinable; the
      // closed-form moments are then identical scalar double math in
      // both engines. Same SQL text as the oracle modulo two dialect
      // rules: the D-suffix on literals (§7.4), and the product's
      // first cast width — (18,6)x(18,6) here (Spark result (37,12),
      // exact; widening to (20,6) would hit precision 39 > 38 and
      // silently ROUND), but (20,6)x(18,6) in the oracle (DuckDB
      // multiplies in the operand's int64 storage and overflows
      // unless one side is widened into int128; result width 38,
      // exact). Both sides stay exact, which is all the hash needs.
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_st")
      s.sql("""
        WITH m AS (
          SELECT l_returnflag,
            count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sqq,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS spp,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sqp
          FROM lineitem_st GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          floor(sqrt((sqq - sq*sq/n) / (n-1)) * 1000000.0D + 0.5D) / 1000000.0D AS stddev_qty,
          floor(((sqq - sq*sq/n) / (n-1)) * 1000000.0D + 0.5D) / 1000000.0D AS var_qty,
          floor(sqrt((spp - sp*sp/n) / (n-1)) * 10000.0D + 0.5D) / 10000.0D AS stddev_price,
          floor(((n*sqp - sq*sp) / (sqrt(n*sqq - sq*sq) * sqrt(n*spp - sp*sp))) * 1000000.0D + 0.5D) / 1000000.0D AS corr_qty_price
        FROM m ORDER BY l_returnflag""")
    }),

    "q_agg_percentile" -> ((s, d) => {
      // Exact percentile: the small-sf ORACLE form. It buffers every
      // value of a group in executor memory, and with 3 groups one
      // task holds ~n/3 of lineitem — use q_agg_percentile_approx
      // (below) as the scale path; this twin exists for bit-exact
      // verification against DuckDB's quantile_cont.
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          rnd(percentile(col("l_quantity"), lit(0.5)), 4).as("p50_qty"),
          rnd(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
          rnd(percentile(col("l_extendedprice"), lit(0.25)), 4)
            .as("p25_price"))
        .orderBy("l_returnflag")
    }),

    "q_agg_percentile_approx" -> ((s, d) => {
      // Scale twin of q_agg_percentile: approx_percentile keeps a
      // bounded KLL-style sketch per group (O(accuracy) memory, merged
      // map-side), so group size never bounds executor memory. Sketch
      // output is engine-specific -> rows-only check here; the
      // PercentileSpec ScalaTest bounds its error against the exact
      // form.
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          rnd(approx_percentile(col("l_quantity"), lit(0.5), lit(10000)),
            4).as("p50_qty"),
          rnd(approx_percentile(col("l_quantity"), lit(0.9), lit(10000)),
            4).as("p90_qty"),
          rnd(approx_percentile(col("l_extendedprice"), lit(0.25),
            lit(10000)), 4).as("p25_price"))
        .orderBy("l_returnflag")
    }),

    "q_null_semantics" -> ((s, d) => {
      // three-valued logic surface: NULLIF / COALESCE / null-safe
      // equality; nulls flushed out of the output via coalesce.
      val segOrNull = nullif(col("c_mktsegment"), lit("BUILDING"))
      t(s, d, "customer").select(
        col("c_custkey"),
        coalesce(segOrNull, lit("WAS_BUILDING")).as("seg_coalesced"),
        (col("c_mktsegment") <=> segOrNull).as("nullsafe_eq"),
        segOrNull.isNull.as("was_nulled"))
        .orderBy("c_custkey")
    }),

    "q_win_ntile" -> ((s, d) => {
      // Global ntile/percent_rank/cume_dist WITHOUT the
      // single-partition `Window.orderBy(...)` (which funnels the
      // whole table through one task): bucket monotonically on the
      // order key, per-bucket counts + cumulative offsets, local
      // row_number within bucket (graft.operators.GlobalRank). The
      // only unpartitioned window left runs over the ~11k-row
      // bucket-count table, not the data.
      import graft.operators.GlobalRank
      val ranked = GlobalRank.withGlobalRank(
        t(s, d, "customer"),
        floor(col("c_acctbal")),
        Seq(col("c_acctbal").asc, col("c_custkey").asc))
      ranked.select(
        col("c_custkey"),
        GlobalRank.ntileOf(col("__rank"), col("__n"), 4).as("quartile"),
        rnd(GlobalRank.percentRankOf(col("__rank"), col("__n")), 6)
          .as("pr"),
        rnd(GlobalRank.cumeDistOf(col("__rank"), col("__n")), 6)
          .as("cd"))
        .orderBy("c_custkey")
    }),

    // ---- sort / limit / top-k / set ops ----

    "q_sort_limit" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    }),

    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    "q_topk_per_group_native" -> ((s, d) => {
      // same result as q_topk_per_group's window formulation, computed
      // by the custom heap-based TopKPerGroupExec (no per-group sort)
      graft.plans.TopKPerGroup(t(s, d, "orders"),
          Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_union" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("id"), lit("cust").as("src"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey").as("id"), lit("supp").as("src"))
      c.unionByName(sup).orderBy("src", "id")
    }),

    "q_union_distinct" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .unionByName(t(s, d, "supplier")
          .select(col("s_nationkey").cast("long").as("nk")))
        .distinct()
        .orderBy("nk")
    }),

    "q_join_full_outer" -> ((s, d) => {
      val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_f"))
        .agg(count(lit(1)).as("n_f"))
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("ck_o"))
        .agg(count(lit(1)).as("n_o"))
      f.join(o, col("ck_f") === col("ck_o"), "full")
        .select(coalesce(col("ck_f"), col("ck_o")).as("custkey"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_o"), lit(0L)).as("n_o"))
        .orderBy("custkey")
    }),

    "q_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    "q_except" -> ((s, d) => {
      t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").filter(col("o_totalprice") > 150000)
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    })
  )

  /** TPC-H Q1-shaped pricing summary — also the flagship `entry`. */
  def aggHash(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        rnd(dsum(col("l_quantity")), 2).as("sum_qty"),
        rnd(dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        rnd(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        rnd(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        rnd(avg(col("l_quantity")), 4).as("avg_qty"),
        rnd(avg(col("l_extendedprice")), 4).as("avg_price"),
        rnd(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val oracle: Map[String, String] = Map(
    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity < 10 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |  floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5) / 10000.0 AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pred" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O')
        |  AND o_totalprice BETWEEN 10000 AND 150000
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_custkey IS NOT NULL
        |  AND (o_orderkey % 3) IN (0, 1)
        |ORDER BY o_orderkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  length(p_name) AS name_len,
        |  trim(' ' || p_name || ' ') AS name_trim,
        |  replace(p_type, ' ', '_') AS type_us,
        |  len(string_split(p_name, ' ')) AS n_tokens,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS brand_dist,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice) * 10.0 + 0.5) / 10.0 AS r1,
        |  floor((abs(l_discount - 0.05)) * 10000.0 + 0.5) / 10000.0 AS a1,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS c1,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS f1,
        |  floor((sqrt(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS s1,
        |  floor((ln(l_extendedprice + 1.0)) * 10000.0 + 0.5) / 10000.0 AS ln1,
        |  floor((pow(l_quantity, 2.0)) * 10000.0 + 0.5) / 10000.0 AS p1,
        |  l_orderkey % 7 AS m1
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_case_when" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 3000 THEN 'low'
        |       WHEN c_acctbal < 7000 THEN 'mid'
        |       ELSE 'high' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_json_funcs" ->
      // TRY_CAST to JSON first: DuckDB's json_extract_string THROWS
      // on malformed JSON where Spark's get_json_object returns NULL
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
        |    AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(coalesce(text, ''), ' ')) AS n_tok,
        |  list_contains(string_split(coalesce(text, ''), ' '), 'data') AS has_data,
        |  array_to_string(list_sort(string_split(coalesce(text, ''), ' '))[1:3], ',') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT user_id,
        |  coalesce(max(CASE WHEN event_type = 'purchase' THEN c END), 0) AS purchases,
        |  coalesce(max(CASE WHEN event_type = 'error' THEN c END), 0) AS errors
        |FROM (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2)
        |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |  floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderpriority,
        |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
        |  count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_multiway" ->
      """SELECT n_name,
        |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_outer" ->
      """SELECT c_custkey,
        |  coalesce(o_orderkey, -1) AS o_key,
        |  coalesce(o_totalprice, -1.0) AS o_price
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_key""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT s_suppkey, count(*) AS n_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal AND c_acctbal <= s_acctbal + 1000
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "q_join_theta_banded" ->
      """SELECT s_suppkey, count(*) AS n_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal AND c_acctbal <= s_acctbal + 1000
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "q_join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_event_id, user_id AS c_user_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, c.c_event_id,
        |        epoch_us(p.ts) - epoch_us(c.c_ts) AS gap,
        |        row_number() OVER (PARTITION BY p.event_id
        |          ORDER BY c.c_ts DESC, c.c_event_id DESC) AS rn
        |      FROM p LEFT JOIN c ON c.c_user_id = p.user_id AND c.c_ts <= p.ts)
        |SELECT event_id, coalesce(c_event_id, -1) AS click_id,
        |       coalesce(gap, -1) AS gap_us
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_self_join" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT a.event_id, b.event_id AS prev_id,
        |  epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.rn = b.rn + 1
        |ORDER BY a.event_id""".stripMargin,

    "q_join_skew_salted" ->
      """SELECT s_suppkey, count(*) AS n_li,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
        |  floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
        |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
        |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_charge,
        |  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS d_parts,
        |  floor((sum(DISTINCT l_quantity)) * 100.0 + 0.5) / 100.0 AS d_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(c_mktsegment, 'ALL') AS segment,
        |  count(*) AS cnt,
        |  floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,

    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS cnt,
        |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS qty,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS cnt,
        |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 14 ORDER BY o_custkey""".stripMargin,

    "q_agg_udaf" ->
      """SELECT l_returnflag,
        |  floor((exp(avg(ln(l_extendedprice)))) * 100.0 + 0.5) / 100.0 AS geo_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_win_rank" ->
      """SELECT s_suppkey, s_nationkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  row_number() OVER w AS rn
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey ASC)
        |ORDER BY s_suppkey""".stripMargin,

    "q_win_analytic" ->
      """SELECT event_id,
        |  coalesce(lag(value, 1) OVER w, -1.0) AS prev_val,
        |  coalesce(lead(value, 1) OVER w, -1.0) AS next_val,
        |  floor((value - coalesce(lag(value, 1) OVER w, 0.0)) * 10000.0 + 0.5) / 10000.0 AS delta,
        |  first_value(event_id) OVER w AS first_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_win_frame" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pr,
        |  floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_per_group_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_union" ->
      """SELECT id, src FROM (
        |  SELECT c_custkey AS id, 'cust' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, 'supp' AS src FROM supplier) u
        |ORDER BY src, id""".stripMargin,

    "q_union_distinct" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_join_full_outer" ->
      """WITH f AS (SELECT o_custkey AS ck_f, count(*) AS n_f FROM orders
        |           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
        |o AS (SELECT o_custkey AS ck_o, count(*) AS n_o FROM orders
        |      WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT coalesce(ck_f, ck_o) AS custkey,
        |       coalesce(n_f, 0) AS n_f,
        |       coalesce(n_o, 0) AS n_o
        |FROM f FULL OUTER JOIN o ON ck_f = ck_o
        |ORDER BY custkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
        |ORDER BY k""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_unpivot" ->
      """SELECT c_custkey, metric, value FROM (
        |  SELECT c_custkey, 'acctbal' AS metric,
        |         CAST(c_acctbal AS DOUBLE) AS value FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey' AS metric,
        |         CAST(c_nationkey AS DOUBLE) AS value FROM customer
        |) ORDER BY c_custkey, metric""".stripMargin,

    "q_agg_stats" ->
      // (20,6)x(18,6): DuckDB must multiply in int128 (one operand
      // widened past 18) or its int64 storage overflows; Spark's side
      // stays (18,6)x(18,6) because 39 > 38 precision would round.
      // Both exact — see the query-side comment.
      """WITH m AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(20,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sqq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6)) * CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS spp,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(20,6)) * CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  floor(sqrt((sqq - sq*sq/n) / (n-1)) * 1000000.0 + 0.5) / 1000000.0 AS stddev_qty,
        |  floor(((sqq - sq*sq/n) / (n-1)) * 1000000.0 + 0.5) / 1000000.0 AS var_qty,
        |  floor(sqrt((spp - sp*sp/n) / (n-1)) * 10000.0 + 0.5) / 10000.0 AS stddev_price,
        |  floor(((n*sqp - sq*sp) / (sqrt(n*sqq - sq*sq) * sqrt(n*spp - sp*sp))) * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  floor((quantile_cont(l_quantity, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50_qty,
        |  floor((quantile_cont(l_quantity, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90_qty,
        |  floor((quantile_cont(l_extendedprice, 0.25)) * 10000.0 + 0.5) / 10000.0 AS p25_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_null_semantics" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'WAS_BUILDING') AS seg_coalesced,
        |  (c_mktsegment IS NOT DISTINCT FROM nullif(c_mktsegment, 'BUILDING')) AS nullsafe_eq,
        |  (nullif(c_mktsegment, 'BUILDING') IS NULL) AS was_nulled
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
