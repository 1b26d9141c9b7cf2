package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational extensions beyond the reference surface (SURVEY.md §2.6
  * "Extension" rows): joins of every flavor, the full aggregate family,
  * window functions, sorts/top-k, set operations, scalar function
  * coverage, pivot and grouping sets.
  *
  * Oracle-parity rules used throughout (driver hash-compares values):
  *  - every computed column aliased identically in Spark and SQL;
  *  - double aggregation goes through decimal(18,2|4) so the result is
  *    exact and engine-independent (double summation order is not
  *    associative), then back to double for a common wire type;
  *  - integer-valued scalars cast to BIGINT on both sides;
  *  - window orderings made total with a unique tie-break key.
  *
  * Scale notes: joins keep their natural shuffle keys; `broadcast()` only
  * on genuinely small dimensions (region/nation/customer/supplier —
  * dimension-sized at every SF); no collect, no coalesce(1) in any plan.
  */
object RelationalQueries {

  /** sum(col) via exact decimal, surfaced as double. */
  private def dsum(c: String, scale: Int = 2): org.apache.spark.sql.Column =
    sum(col(c).cast(s"decimal(18,$scale)")).cast("double")

  /** KMV sketch size: ~1/sqrt(k) ≈ 12% relative error, 64 longs of
    * state per group.
    */
  private val KmvK = 64
  /** q_sketch_approx sizing: KMV buffer (k longs per group) and the
    * price-histogram bucket width (a power of two, so the bucketing
    * division is exact in IEEE doubles on every engine).
    */
  private val SketchK = 256
  private val SketchBucket = 256L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation family ------------------------------------------
    // TPC-H Q1 shape: hash aggregate with partial (map-side) combine;
    // at 100 TB the shuffle carries #groups × #partitions rows only.
    // Top-k per group via the bounded-heap Aggregator: the shuffle
    // carries at most k rows per (partition, group) — compare q_topk's
    // window row_number, which sorts and shuffles every row.
    "q_topk_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.Aggregators.topK(3)(
          col("o_totalprice").cast("double"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), explode(col("top")).as("t"))
        .select(col("o_orderpriority"),
          col("t._1").as("price"), col("t._2").as("okey"))),

    // NULL semantics: NULLIF-induced nulls, COALESCE, null-safe equality
    // (<=>), and the count(col) vs count(*) distinction.
    "q_null_semantics" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("rf_n", nullif(col("l_returnflag"), lit("N")))
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("rf_n")).as("n_nonnull"),
          count(when(col("rf_n") <=> lit(null), 1)).as("n_null_safe_eq"),
          countDistinct(coalesce(col("rf_n"), lit("?"))).as("n_distinct_c"))),

    // Exact second moments: variance/stddev over doubles is
    // order-nondeterministic, so compute Σx and Σx² as exact decimals
    // and derive the variance once in double — engine-identical.
    "q_agg_moments" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("s1d"),
          sum((col("l_quantity").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)"))
            .as("s2d"))
        .select(col("l_returnflag"), col("n"),
          col("s1d").cast("double").as("sum_q"),
          ((col("s2d").cast("double") -
            col("s1d").cast("double") * col("s1d").cast("double") / col("n"))
            / (col("n") - 1)).as("var_q"))),

    // Sketch aggregates with the SKETCH shape (bounded per-group state,
    // exactly-mergeable partials) in PORTABLE form, so the estimates
    // themselves oracle-gate. Bench note: the round-5 5.69 s median was
    // adjudicated as host contention — round 6 re-measured 1.42 s at
    // sf0.1 with this plan unchanged, in line with the 1.71 s history,
    // so the two-aggregation shape (KMV + histogram over one scan)
    // stays as is. Approximate distinct is the KMV estimator
    // ((k−1)·2^31 div kth-smallest distinct hash — k longs of state per
    // group, pure integers) and approximate median is the smallest
    // SketchBucket-wide price bucket whose cumulative count covers half
    // the group (state bounded by the price domain / bucket width; the
    // power-of-two width keeps the double division exact in IEEE, so
    // both engines bucket identically). Spark's native sketches
    // (approx_count_distinct's HLL++, percentile_approx's KLL) have the
    // same plan shape but engine-private state, which would force a
    // weaker rows-only gate; accuracy vs the exact answers is asserted
    // in PartitioningSpec.
    "q_sketch_approx" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
      val est = li.groupBy(col("l_returnflag"))
        .agg(graft.functions.Aggregators.minKDistinct(SketchK)(
          Portable.lcg(col("l_partkey"))).as("mins"))
        .select(col("l_returnflag"),
          when(size(col("mins")) < SketchK, size(col("mins")).cast("long"))
            .otherwise(expr(
              s"(${SketchK - 1} * 2147483648) div element_at(mins, $SketchK)"))
            .as("approx_parts"))
      val hist = li.groupBy(col("l_returnflag"),
          (floor(col("l_extendedprice") / SketchBucket) * SketchBucket)
            .cast("long").as("pb"))
        .agg(count(lit(1)).as("cnt"))
      val med = hist
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("pb"))))
        .withColumn("tot", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag"))))
        .filter(col("cum") * 2L >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("pb")).as("p50_price"))
      est.join(med, "l_returnflag")
    }),

    // K-minimum-values distinct sketch — approximation with a FULLY
    // oracle-gated estimate: the sketch state is the k smallest
    // distinct values of a pure-integer hash (bounded buffer per
    // group, exactly mergeable — Aggregators.MinKDistinctAggregator),
    // and est = (k-1)·2^31 div kth-min is integer arithmetic, so both
    // engines produce the IDENTICAL estimate (q_sketch_approx applies
    // the same device per-aggregate; here the exact countDistinct rides
    // along to show the sketch's error live).
    "q_kmv_distinct" -> ((s, d) => {
      val k = KmvK
      // Collapse to distinct (flag, partkey) BEFORE the sketch: the
      // distinct gets map-side partial dedupe, the KMV buffer then sees
      // each value once (not once per lineitem), and the exact count
      // becomes a plain count over the same distinct set. h is a pure
      // function of partkey, so sketching after the distinct is
      // identical to sketching the raw stream.
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .withColumn("h", Portable.lcg(col("l_partkey")))
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.Aggregators.minKDistinct(k)(col("h")).as("mins"),
          count(lit(1)).as("exact_distinct"))
        .select(col("l_returnflag"),
          when(size(col("mins")) < k, size(col("mins")).cast("long"))
            .otherwise(expr(s"(${k - 1} * 2147483648) div element_at(mins, $k)"))
            .as("est_distinct"),
          col("exact_distinct"))
    }),

    // Custom typed Aggregator (UDAF surface): one partial-aggregating
    // buffer per (partition, key); see graft.functions.Aggregators.
    "q_custom_udaf" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.Aggregators.longStats(col("q")).as("st"))
        .select(col("l_returnflag"), col("st.n_q").as("n_q"),
          col("st.sum_q").as("sum_q"), col("st.min_q").as("min_q"),
          col("st.max_q").as("max_q"))),

    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_discount").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))
    }),

    "q_agg_distinct" -> ((s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderpriority")).agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))),

    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("qty"))),

    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"))),

    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      """)
    }),

    // ---- joins --------------------------------------------------------
    // Small dim → explicit broadcast: no shuffle of the fact side at all.
    "q_join_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
    }),

    // Fact-fact equi-join: both sides shuffle on the join key once; the
    // groupBy reuses the join output without an extra exchange.
    "q_join_shuffle" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), dsum("l_extendedprice").as("sum_price"))
    }),

    "q_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // The same join under Skew.saltedJoin: the large side's key is
    // spread over 8 salt buckets and orders is replicated 8× — the
    // manual skew-mitigation pattern for when one hot orderkey would
    // stall a reducer and the dim is too big to broadcast. The result
    // is identical to q_join_shuffle's shape (salt never reaches the
    // output); PartitioningSpec pins the exchange carrying _salt.
    "q_join_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, o, "o_orderkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dsum("l_quantity").as("sum_qty"))
    }),

    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Filter on status 'F' so some customers genuinely lack matches (the
    // synthetic data gives every customer at least one order overall —
    // unfiltered anti-join would be a vacuous 0=0 gate).
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Star-schema chain: dims broadcast, fact never leaves its partitions
    // until the final (tiny) aggregation.
    "q_join_multiway" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum("o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // ---- window functions ----------------------------------------------
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"), col("rnk").cast("long").as("rnk"))
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
    }),

    // RANGE frame: value-based window (all rows within 5 quantity units
    // below), vs the row-count frames above. Exact longs keep the frame
    // boundary and sum engine-identical. Partitioned by the natural
    // entity key (order) like every window demo here: partitions stay
    // order-sized at any corpus scale — a single-digit-cardinality key
    // (returnflag) would serialize the corpus into a handful of sort
    // tasks at 100×.
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("q"))
        .rangeBetween(-5L, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("q"))
        .withColumn("range_cnt", count(lit(1)).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("q"),
          col("range_cnt"))
    }),

    // ntile / percent_rank / cume_dist analytic family with a total
    // order; percent_rank and cume_dist are exact small-int ratios —
    // compared unrounded, both engines derive them from identical
    // (rank, count) integers. Per-customer partitions: person-sized at
    // any corpus scale (see q_window_range_frame's key note).
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    }),

    // Value-navigation window functions — dense_rank (no rank gaps),
    // first/last/nth over an explicit running frame. The frame is
    // UNBOUNDED PRECEDING..CURRENT ROW on a total order, so last_value
    // is well-defined (the default frame's last_value is the current
    // row — a classic cross-engine trap avoided by pinning the frame).
    // Per-customer partitions: person-sized at any corpus scale (see
    // q_window_range_frame's key note).
    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice"), col("o_orderkey")))
            .cast("long").as("drank"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          last(col("o_orderkey")).over(w).as("self_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
    }),

    // FULL OUTER join: customers and a filtered order subset, both
    // null-extended sides observable in the aggregate.
    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(
          when(col("c_custkey").isNull, -1L).otherwise(col("c_custkey"))
            .as("cust"),
          col("o_orderkey"))
        .groupBy(col("cust"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_price"), col("next_key"))
    }),

    // ---- sorts / top-k --------------------------------------------------
    // orderBy+limit compiles to TakeOrderedAndProject: per-partition
    // top-k then a k-row merge on the driver — no global sort at scale.
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // Exact discrete percentiles (p50/p90/p99) per group: the value at
    // rank ceil(p·n) in sorted order — rank-based, so the result is
    // exact and engine-independent (interpolated percentiles do float
    // arithmetic whose last bit differs across engines; the value AT a
    // rank is unique no matter how ties are permuted). Scale shape (the
    // docs_quality_quantile pattern): NO window over raw orders — the
    // only corpus-wide exchange is a partially-aggregated (priority,
    // price) HISTOGRAM, bounded by the VALUE DOMAIN (TPC-H totalprice
    // is a 2-decimal value in a fixed range — tens of millions of
    // distinct cents at most, regardless of corpus row count), not by
    // the corpus; the cumulative window then runs over that histogram
    // and "value at rank r" = smallest value whose cumulative count
    // reaches r — identical to the row_number formulation for every
    // tie permutation, without ever sorting a corpus-sized slice in
    // one task.
    "q_percentile_disc" -> ((s, d) => {
      val hist = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(count(lit(1)).as("cnt"))
      val byVal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
      val byGrp = Window.partitionBy(col("o_orderpriority"))
      hist
        .withColumn("cum", sum(col("cnt")).over(byVal))
        .withColumn("n", sum(col("cnt")).over(byGrp))
        .groupBy(col("o_orderpriority"))
        .agg(
          min(when(col("cum") >= ceil(col("n") * 0.5), col("o_totalprice")))
            .as("p50"),
          min(when(col("cum") >= ceil(col("n") * 0.9), col("o_totalprice")))
            .as("p90"),
          min(when(col("cum") >= ceil(col("n") * 0.99), col("o_totalprice")))
            .as("p99"))
    }),

    // TPC-H Q3 shape — the canonical 3-way join + aggregate + top-k
    // composite: segment-filtered customers ⋈ open orders ⋈ late-shipped
    // lineitems, revenue per order, top 10. The plan to want at 100 TB:
    // both filters reach their scans (PushedFilters), the filtered
    // customer side broadcasts, orders⋈lineitem shuffles on the join
    // key with partial aggregation before the exchange, and the top-10
    // is TakeOrderedAndProject (per-partition heaps, never a full
    // sort). Revenue in decimal (exact, associative) cast back to
    // double; l_orderkey added to the sort key so the limit boundary
    // is deterministic across engines.
    "q3_shipping" -> ((s, d) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
    }),

    // TPC-H Q5 shape — the 6-way snowflake with the "local supplier"
    // constraint (customer and supplier share a nation): the deepest
    // composite in the registry. Scale shape: the region→nation chain
    // is explicitly broadcast (5 and 25 rows at any SF); supplier,
    // orders (year-filtered at its scan) and customer are left
    // UNHINTED — they grow with the corpus, so AQE picks broadcast vs
    // shuffle from measured sizes. lineitem, the dominant table, is
    // only ever joined on its own keys and partially pre-aggregated
    // into the final 25-group per-nation revenue.
    "q5_local_supplier" -> ((s, d) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val nat = Tables.nation(s, d)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }),

    // TPC-H Q6 shape — the pure scan-side query: every predicate is a
    // range over a scanned column, so the whole WHERE clause must reach
    // the parquet reader as PushedFilters and the plan is one narrow
    // scan + one partial-aggregating scalar sum. At 100 TB this query
    // IS its scan: no shuffle beyond the single-row final combine. The
    // decimal(18,4) product keeps price×discount exact so both engines
    // sum identically.
    "q6_forecast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").cast("decimal(18,2)").between(
            lit(0.05).cast("decimal(18,2)"), lit(0.07).cast("decimal(18,2)")) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue"))),

    // TPC-H Q10 shape — "who returned merchandise last quarter": orders
    // in a 3-month window ⋈ their RETURNED lineitems ⋈ customer, top 20
    // by lost revenue. Scale shape: both time/flag filters reach their
    // scans; orders⋈lineitem shuffles on o_orderkey with the revenue
    // partially pre-aggregated; customer joins AFTER the aggregation,
    // so only ≤#customers aggregated rows (not raw lineitems) meet the
    // customer table; top-20 is TakeOrderedAndProject. c_custkey in the
    // sort key makes the limit boundary deterministic.
    "q10_returned" -> ((s, d) => {
      val lo = lit("1996-10-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))
      val perCust = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
      perCust
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("revenue"))
    }),

    // Correlated scalar subquery — "orders above their customer's own
    // average": the decorrelation showcase. Declared as a correlated
    // subquery in both engines; Catalyst rewrites it to a per-customer
    // aggregate + join (one shuffle keyed by customer, partial agg
    // map-side), which is exactly the hand-written plan — the point is
    // that the declarative form COSTS nothing vs the manual rewrite.
    // The threshold is a FLOOR-divided average in exact integer cents
    // (decimal×100 has a .00 fraction, so the BIGINT cast is exact in
    // both engines; `div` avoids the avg-rescale rounding that differs
    // across engines).
    "q_correlated_scalar" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS total
        FROM g_orders o
        WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >
          (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100)
                       AS BIGINT) div COUNT(*)
           FROM g_orders i WHERE i.o_custkey = o.o_custkey)""")
    }),

    // Fixed-width histogram — the profiling scan every ingest pipeline
    // runs: bucket = cents div 50000 ($500 buckets), one narrow scan +
    // one partial-aggregating hash aggregate whose shuffle carries only
    // #buckets × #partitions rows. Bucketing in exact integer cents:
    // decimal(18,2)×100 has a .00 fraction, so the BIGINT cast is exact
    // in both engines (DuckDB's BIGINT cast rounds, Spark's truncates —
    // a real divergence for any fractional value), and floor division
    // means the same thing on both sides.
    "q_histogram" -> ((s, d) =>
      Tables.part(s, d)
        .select(expr(
          "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 50000")
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"))),

    "q_sort_limit" -> ((s, d) =>
      Tables.part(s, d)
        .orderBy(col("p_retailprice"), col("p_partkey"))
        .limit(50)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))),

    // ---- set operations -------------------------------------------------
    "q_set_union" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"))
      cn.union(sn).distinct()
    }),

    "q_set_intersect" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"))
      cn.intersect(sn)
    }),

    // Custkeys that ordered but never with status 'F' — sets chosen so
    // the difference is non-empty (nationkey sets were identical: 0=0).
    "q_set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
    }),

    // Bag-semantics set ops: INTERSECT ALL keeps min multiplicity,
    // EXCEPT ALL subtracts multiplicities — both plan as one hash
    // aggregate per side (count per key) + a join on the key, so the
    // shuffle carries distinct keys + counts, never the raw bags.
    "q_set_intersect_all" -> ((s, d) => {
      val cn = Tables.customer(s, d)
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sn = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("int").as("nationkey"))
      cn.intersectAll(sn)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
    }),

    "q_set_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_custkey").as("custkey"))
        .exceptAll(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("multiplicity"))
    }),

    // ---- scalar functions ------------------------------------------------
    "q_scalar_string" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"))),

    // Regex scalar family — extract / extract-all / match-filter, in
    // the Java-regex ∩ RE2 common subset (char classes + anchors, no
    // lookaround) so both engines compile the same automaton. All
    // row-local and codegen'd; the rlike filter is not pushable (regex
    // predicates don't reach parquet) — expected to evaluate post-scan.
    "q_regex" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").rlike("^(small|blue) "))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 2).as("noun"),
          regexp_extract(col("p_name"), "^(\\w+) (\\w+)$", 1).as("adj"),
          array_join(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"), "-")
            .as("vowel_runs"))),

    // Bitwise scalar family — popcount/shifts/and/or/xor/hex, the ops
    // every hash/bucket/bitmap layer is written in terms of. All
    // row-local integer arithmetic, identical on any engine. The
    // left-shift input is masked to 60 bits FIRST: on overflow Spark's
    // shiftleft wraps (Java) while DuckDB's << raises — masking makes
    // the op total with the same value on both engines for every
    // representable key (a no-op below 2^60, far above any real key).
    "q_scalar_bits" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_partkey"),
        bit_count(col("l_orderkey")).cast("long").as("popcnt"),
        shiftleft(col("l_orderkey")
          .bitwiseAND(lit(0x0FFFFFFFFFFFFFFFL)), 3).as("shl"),
        shiftright(col("l_orderkey"), 2).as("shr"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
        hex(col("l_orderkey")).as("hexkey"))),

    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))),

    "q_scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - lit(25.0)).as("dev25"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        round(col("l_extendedprice").cast("decimal(18,2)") * lit(2), 2)
          .cast("double").as("double_price"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod7"))),

    "q_scalar_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"))),

    "q_case_when" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low").as("price_band"))),

    // String aggregation (listagg) — the reporting concatenate. Made
    // deterministic the only way it can be: DISTINCT + WITHIN GROUP
    // ordering. State is bounded by the VALUE domain (≤3 statuses),
    // not the row count — the contract that makes listagg safe in a
    // 100 TB group-by (never listagg an unbounded payload column).
    "q_string_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sa")
      s.sql("""
        SELECT l_returnflag,
               listagg(DISTINCT l_linestatus, ',')
                 WITHIN GROUP (ORDER BY l_linestatus) AS statuses,
               COUNT(*) AS cnt
        FROM lineitem_sa GROUP BY l_returnflag""")
    }),

    // Error-safe arithmetic under ANSI mode: try_divide/try_cast turn
    // would-be runtime errors (div-by-zero, bad casts) into NULLs —
    // row-local, codegen'd, and the difference between a 100 TB job
    // that finishes with a null column and one that dies at hour nine
    // on the first malformed row. The cast input is MOSTLY valid with a
    // rare (~1%) failing slice — deliberately: TRY-mode string→int pays
    // a caught NumberFormatException per FAILING row (measured 4.6 s vs
    // 0.26 s on 600k all-failing rows), so an always-failing column is
    // an anti-pattern, while the rare-corruption mix is both the
    // realistic shape and the cheap one.
    "q_try_arith" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"),
          col("l_quantity") - lit(1.0)).as("unit_price_m1"),
        try_element_at(split(col("l_returnflag"), "X"), lit(2)).as("no_elem"),
        expr("""try_cast(CASE WHEN l_orderkey % 97 = 0 THEN l_returnflag
                         ELSE CAST(l_linenumber AS STRING) END AS INT)""")
          .as("mostly_int"))),

    // ---- pivot -------------------------------------------------------------
    "q_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // ---- correlated subquery (EXISTS → semi join under Catalyst) -----------
    "q_exists_subq" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_ex")
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM orders_ex o
        WHERE EXISTS (SELECT 1 FROM lineitem_ex l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      """)
    }),

    // TPC-H Q4 shape — priority counting gated by a CORRELATED exists
    // with an inequality across tables (l_shipdate > o_orderdate):
    // Catalyst decorrelates into a left-semi join on the equi-part with
    // the inequality as the join residual, then a 5-group aggregate.
    // At 100 TB the quarter filter reaches the orders scan and the semi
    // join never widens lineitem — rows only ever shrink. (The
    // testdata has no l_commitdate/l_receiptdate, so the correlated
    // inequality is shipped-after-order — same plan shape.)
    "q4_priority_count" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_q4")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q4")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_q4 o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem_q4 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
      """)
    }),

    // TPC-H Q12 shape — join + two-way CONDITIONAL counting: for each
    // lineitem class (returnflag stands in for the testdata's missing
    // l_shipmode), how many of its 1996 shipments belong to urgent vs
    // non-urgent orders. Scale shape: the year filter reaches the
    // lineitem scan, the join shuffles on the natural orderkey, and the
    // CASE-sums partially aggregate map-side — the exchange after the
    // join carries ≤ #flags × #partitions rows.
    "q12_priority" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
    }),

    // TPC-H Q14 shape — promo revenue share: one month of lineitem ⋈
    // part, a conditional numerator over an unconditional denominator.
    // Both sums are exact decimals cast to double; the final divide is
    // one IEEE double op (identical in any engine). Scale shape: the
    // month filter reaches the lineitem scan FIRST (≈1/84th of the
    // fact table survives), and part joins the survivors on its key —
    // AQE picks broadcast vs shuffle from the measured filtered size.
    "q14_promo" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("rev")).cast("double")).as("promo_share"))
    }),

    // TPC-H Q18 shape — large-volume orders: GROUP-BY-HAVING as a
    // semi-filter, then the dimension joins AFTER the aggregate. Scale
    // shape: the only full-fact shuffle is the per-order quantity
    // aggregate (partial map-side combine, key = orderkey); the HAVING
    // survivor set (~0.7% of orders) is what meets orders and customer,
    // and the top-100 is TakeOrderedAndProject. o_orderkey in the sort
    // key pins the limit boundary across engines.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
        .filter(col("total_qty") > 250.0)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
    }),

    // TPC-H Q19 shape — the disjunctive-predicate join: three
    // brand/size/quantity conjunctions OR-ed across both join sides.
    // The planner test: the partkey equi-join must still be extracted
    // from under the OR (a naive engine degrades to an NLJ), the
    // part-only disjuncts (brand, size≤15) push to the part scan, and
    // the residual evaluates post-join. One scalar exact-decimal sum.
    "q19_disjunctive" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(
        col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val clause = (
        col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) || (
        col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) || (
        col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(clause)
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }),

    // TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    // join with the o-side filter ON THE JOIN (in a WHERE it would
    // turn the join inner and silently drop the zero-order customers —
    // the entire point of Q13), per-customer count of the nullable
    // join column (no-match rows count 0), then the distribution over
    // counts. Two entity-keyed aggregations; the second input is
    // #customers rows of two ints, the output #distinct-counts rows.
    "q13_custdist" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
      c.join(o,
          col("c_custkey") === col("o_custkey") &&
            col("o_orderstatus") =!= "F", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    // revenue "view" is one supplier-keyed lineitem aggregate; its max
    // is a one-row aggregate broadcast back (scalar-subquery
    // decorrelation — lineitem scans ONCE), and the tie-keeping
    // equality compares the EXACT decimals, cast to double only on
    // output.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
    }),

    // TPC-H Q17 shape — small-quantity revenue for one brand: the
    // correlated per-part average decorrelates to ONE per-part
    // aggregate joined back (the spec-pinned decorrelation class —
    // never a per-row subplan). The threshold is SUM/COUNT, not avg():
    // quantities are integer-valued doubles, so the sum is
    // order-independent in IEEE and both engines compute the identical
    // 0.2× boundary; revenue sums in decimal, one /7.0 in double.
    "q17_small_qty" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      val lp = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = lp.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity")) / count(col("l_quantity")))
          .as("avg_qty"))
      lp.join(avgq, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q21 shape — suppliers who alone held up multi-supplier
    // orders: the textbook form is a DOUBLE correlation (EXISTS another
    // supplier in the order, NOT EXISTS another LATE supplier in the
    // order — the oracle states it exactly that way); at scale the
    // right plan is ONE per-order aggregate instead — n_supps and
    // n_late_supps per order (two countDistincts over the same
    // grouping), then "late AND n_supps > 1 AND n_late_supps = 1".
    // Late = shipped >90 days after order date (the schema's stand-in
    // for receipt>commit). Self-correlation becomes a single
    // order-keyed shuffle; no per-row subplan anywhere.
    "q21_waiting" -> ((s, d) => {
      val lo = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val perOrder = lo.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(when(col("is_late"), col("l_suppkey")))
            .as("n_late_supps"))
      lo.filter(col("is_late"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(perOrder, "l_orderkey")
        .filter(col("n_supps") > 1 && col("n_late_supps") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("numwait")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q22 shape — dormant rich customers per country code
    // (c_nationkey % 10 stands in for the phone prefix): the
    // positive-balance average threshold compares in PURE INTEGER
    // CENTS (n_pos·cents(c) > Σcents ⟺ c_acctbal > avg), so the
    // FP-tie hazard of avg-of-doubles never arises; the no-orders
    // test is an anti join shuffling ids only; the one-row threshold
    // broadcasts.
    "q22_global_sales" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(
        col("c_custkey"),
        (col("c_nationkey") % 10).as("cntrycode"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val thr = cust.filter(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("sum_cents"),
          count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(thr))
        .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal_cents")).as("tot_cents"))
    }),

    // TPC-H Q2 shape — min-cost supplier per part in a region. The
    // schema has no partsupp, so the part↔supplier relation derives
    // from lineitem (DISTINCT pairs — who actually supplied what) and
    // s_acctbal stands in for ps_supplycost, compared in EXACT integer
    // cents. The correlated "cost = (SELECT MIN ...)" decorrelates to
    // ONE per-part aggregate joined back on equality (ties keep every
    // min-cost supplier, as in the spec); the final ORDER BY carries
    // unique keys so the LIMIT is deterministic. Region-filtered
    // supplier and filtered part legs broadcast.
    "q2_min_cost_supplier" -> ((s, d) => {
      val euSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("cost_cents"))
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey")).distinct()
      val parts = Tables.part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"))
      val cand = ps
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(euSupp), col("ps_suppkey") === col("s_suppkey"))
      val minc = cand.groupBy(col("p_partkey").as("mk"))
        .agg(min(col("cost_cents")).as("min_cents"))
      cand.join(minc, col("p_partkey") === col("mk") &&
          col("cost_cents") === col("min_cents"))
        .select((col("cost_cents").cast("double") / 100.0).as("s_acctbal"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11 shape — important stock values: per-part value held by
    // one nation's suppliers, kept when it exceeds 1/1000 of that
    // scope's total. Value computes in integer 10⁻⁴-dollar units
    // (ext_cents·(100−disc_cents)), the global total is a one-row
    // aggregate broadcast back (scalar-subquery decorrelation — the
    // scan runs once), and the fraction test is the pure-integer form
    // v·1000 > total. partsupp stands in as lineitem rows directly.
    "q11_important_stock" -> ((s, d) => {
      val nat3 = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val byPart = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("val_e4"))
        .join(broadcast(nat3), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("ps_partkey"))
        .agg(sum(col("val_e4")).as("v"))
      val tot = byPart.agg(sum(col("v")).as("t"))
      byPart.crossJoin(broadcast(tot))
        .filter(col("v") * 1000L > col("t"))
        .select(col("ps_partkey"),
          (col("v").cast("double") / 10000.0).as("value"))
    }),

    // TPC-H Q16 shape — supplier count per (brand, type, size) for
    // qualifying parts, excluding complained-about suppliers (acctbal
    // < 0 stands in for the comment filter). The exclusion is the
    // textbook NOT IN — a broadcast anti join over a tiny filtered
    // scan — and the count is DISTINCT suppliers per group (the
    // Expand-based distinct aggregate). The part↔supplier relation
    // again derives from DISTINCT lineitem pairs.
    "q16_supplier_cnt" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val bad = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey")).distinct()
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q20 shape — excess-stock suppliers: NATION_4 suppliers
    // holding more than half the demand of some 'small%' part —
    // stock on hand stands in as the pair's 1995 shipments, demand as
    // its 1996 shipments (avail > 0.5·demand ⟺ 2·q95 > q96, pure
    // integers; the original's availqty has no derivable superset-free
    // twin, and a superset would satisfy the inequality vacuously).
    // The textbook nested IN(IN(...)) decorrelates to one pair-keyed
    // aggregate and two semi joins; the part filter broadcasts.
    "q20_excess_stock" -> ((s, d) => {
      val smallParts = Tables.part(s, d)
        .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
      val pairs = Tables.lineitem(s, d)
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(when(year(col("l_shipdate")) === 1995,
            round(col("l_quantity")).cast("long")).otherwise(0L)).as("q95"),
          sum(when(year(col("l_shipdate")) === 1996,
            round(col("l_quantity")).cast("long")).otherwise(0L)).as("q96"))
        .filter(col("q95") * 2L > col("q96"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_4").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(pairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // TPC-H Q7 shape — bilateral shipping volume between two nations by
    // year: both dimension legs (supplier→nation, customer→nation) are
    // pre-FILTERED to the two nations before touching a fact table, so
    // the join inputs carry only the ~2/25 slice; the supplier leg
    // broadcasts. The nation-pair disjunction evaluates post-join on
    // the two small dictionary columns, never on raw keys.
    "q7_volume_shipping" -> ((s, d) => {
      val n = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }),

    // TPC-H Q8 shape — national market share: NATION_2's fraction of
    // ECONOMY-part revenue sold into ASIA-region customers per order
    // year. The share divides two EXACT decimal sums cast to double
    // (identical operands ⇒ identical IEEE quotient); the conditional
    // numerator is the null-skipping SUM(CASE) in both engines,
    // COALESCEd for years with no NATION_2 sales. Part and supplier
    // legs broadcast; the customer-region restriction is applied
    // before the orders join.
    "q8_market_share" -> ((s, d) => {
      val asia = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_year"))
        .agg((coalesce(
          sum(when(col("supp_nation") === "NATION_2", col("rev")))
            .cast("double"), lit(0.0)) /
          sum(col("rev")).cast("double")).as("mkt_share"))
    }),

    // TPC-H Q9 shape — product-line profit by supplier nation and
    // year. The schema has no partsupp, so supply cost stands in as
    // 0.5·p_retailprice·l_quantity. That makes profit a TRIPLE
    // product, where Spark's precision-loss decimal widening and
    // DuckDB's overflow-to-double rules diverge — so the whole
    // amount computes in PURE INTEGER 10⁻⁴-dollar units
    // (cents × cents/100 × integer quantity), summed as BIGINT and
    // divided by 10⁴ once at output: FP-free, engine-independent,
    // overflow-safe to sf well beyond the harness. Part (name-filtered)
    // and supplier+nation legs broadcast.
    "q9_product_profit" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("ext_cents"),
          round(col("l_discount") * 100).cast("long").as("disc_cents"),
          round(col("l_quantity")).cast("long").as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("amount_e4",
          col("ext_cents") * (lit(100L) - col("disc_cents")) -
            col("retail_cents") * col("qty") * 50L)
        .groupBy(col("nation"), col("o_year"))
        .agg((sum(col("amount_e4")).cast("double") / 10000.0)
          .as("sum_profit"))
    }),

    // ---- unpivot (wide → long), the inverse of q_pivot ---------------------
    // Dataset.unpivot is a zero-shuffle narrow op: each input row emits
    // one row per value column inside the scan stage. At 100 TB this is
    // the melt step of every feature-extraction pipeline — no exchange,
    // no sort, output is input × #attrs.
    "q_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")),
          "attr", "val")),

    // ---- map-typed scalar functions ----------------------------------------
    // MapType construction and lookup (map_from_arrays / element_at /
    // map_keys / map_values) — the schema-flexible K→V column every
    // metadata pipeline carries. Final schema is plain columns so the
    // oracle needs no map wire type; all ops are codegen'd row-local.
    "q_scalar_map" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        map_from_arrays(
          array(lit("type"), lit("uid")),
          array(col("event_type"), col("user_id").cast("string"))).as("m"))
        .select(
          col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          element_at(col("m"), "uid").as("m_uid"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          array_join(sort_array(map_values(col("m"))), ",").as("vals_sorted")))
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_agg_distinct" -> """
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderpriority""",
    "q_rollup" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q_join_broadcast" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""",
    "q_join_shuffle" -> """
      SELECT o_orderpriority, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority""",
    "q_join_left" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey""",
    // Salting is invisible to the result: the oracle is the plain join.
    "q_join_salted" -> """
      SELECT o_orderpriority, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority""",
    "q_join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
    // NOT EXISTS, not NOT IN: left_anti keeps non-matching rows even if
    // the subquery side had NULL keys, exactly NOT EXISTS semantics
    // (NOT IN yields zero rows if any o_custkey were NULL).
    "q_join_anti" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
    "q_join_multiway" -> """
      SELECT r_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""",
    "q_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
          CAST(RANK() OVER w AS BIGINT) AS rnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) WHERE rn <= 3""",
    "q_window_range_frame" -> """
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q,
             COUNT(*) OVER (PARTITION BY l_orderkey
                            ORDER BY CAST(l_quantity AS BIGINT)
                            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS range_cnt
      FROM lineitem""",
    "q_window_ntile" -> """
      SELECT o_custkey, o_orderkey,
             CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""",
    "q_join_full" -> """
      SELECT COALESCE(c_custkey, -1) AS cust, COUNT(o_orderkey) AS n_orders
      FROM customer c FULL OUTER JOIN
           (SELECT * FROM orders WHERE o_totalprice > 400000) o
        ON c.c_custkey = o.o_custkey
      GROUP BY COALESCE(c_custkey, -1)""",
    "q_window_running" -> """
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders""",
    "q_window_lag" -> """
      SELECT o_custkey, o_orderkey,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_orderkey, 1) OVER w AS next_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q_topk_agg" -> """
      SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price, o_orderkey AS okey
      FROM (
        SELECT o_orderpriority, o_totalprice, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3""",
    "q_null_semantics" -> """
      SELECT l_linestatus,
             COUNT(*) AS n_rows,
             COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull,
             COUNT(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULL THEN 1 END) AS n_null_safe_eq,
             COUNT(DISTINCT COALESCE(NULLIF(l_returnflag, 'N'), '?')) AS n_distinct_c
      FROM lineitem GROUP BY l_linestatus""",
    "q_agg_moments" -> """
      WITH m AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s1d,
               SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS s2d
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             CAST(s1d AS DOUBLE) AS sum_q,
             (CAST(s2d AS DOUBLE) - CAST(s1d AS DOUBLE) * CAST(s1d AS DOUBLE) / n) / (n - 1) AS var_q
      FROM m""",
    "q_sketch_approx" -> s"""
      WITH hashes AS (
        SELECT DISTINCT l_returnflag,
          ${Portable.lcgSql("l_partkey")} AS h
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, h,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        FROM hashes),
      est AS (
        SELECT l_returnflag,
          CASE WHEN COUNT(*) < $SketchK THEN COUNT(*)
               ELSE (${SketchK - 1} * 2147483648) // MAX(h) END AS approx_parts
        FROM ranked WHERE rn <= $SketchK GROUP BY l_returnflag),
      hist AS (
        SELECT l_returnflag,
          CAST(FLOOR(l_extendedprice / $SketchBucket) * $SketchBucket AS BIGINT) AS pb,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
      med AS (
        SELECT l_returnflag, MIN(pb) AS p50_price FROM (
          SELECT l_returnflag, pb,
            SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY pb) AS cum,
            SUM(cnt) OVER (PARTITION BY l_returnflag) AS tot
          FROM hist)
        WHERE cum * 2 >= tot GROUP BY l_returnflag)
      SELECT e.l_returnflag, CAST(e.approx_parts AS BIGINT) AS approx_parts,
             m.p50_price
      FROM est e JOIN med m USING (l_returnflag)""",
    "q_kmv_distinct" -> s"""
      WITH hashes AS (
        SELECT DISTINCT l_returnflag,
          ${Portable.lcgSql("l_partkey")} AS h
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, h,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        FROM hashes),
      est AS (
        SELECT l_returnflag,
          CASE WHEN COUNT(*) < $KmvK THEN COUNT(*)
               ELSE (${KmvK - 1} * 2147483648) // MAX(h) END AS est_distinct
        FROM ranked WHERE rn <= $KmvK GROUP BY l_returnflag),
      ex AS (
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
        FROM lineitem GROUP BY l_returnflag)
      SELECT e.l_returnflag, CAST(e.est_distinct AS BIGINT) AS est_distinct,
             CAST(x.exact_distinct AS BIGINT) AS exact_distinct
      FROM est e JOIN ex x USING (l_returnflag)""",
    "q_custom_udaf" -> """
      SELECT l_returnflag,
             COUNT(*) AS n_q,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
             MIN(CAST(l_quantity AS BIGINT)) AS min_q,
             MAX(CAST(l_quantity AS BIGINT)) AS max_q
      FROM lineitem GROUP BY l_returnflag""",

    "q_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_percentile_disc" -> """
      SELECT o_orderpriority,
        MAX(CASE WHEN rn = CEIL(n * 0.5) THEN o_totalprice END) AS p50,
        MAX(CASE WHEN rn = CEIL(n * 0.9) THEN o_totalprice END) AS p90,
        MAX(CASE WHEN rn = CEIL(n * 0.99) THEN o_totalprice END) AS p99
      FROM (
        SELECT o_orderpriority, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      GROUP BY o_orderpriority""",
    "q3_shipping" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name""",
    "q6_forecast" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND CAST(l_discount AS DECIMAL(18,2))
              BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
        AND l_quantity < 24""",
    "q10_returned" -> """
      SELECT c_custkey, c_name, c_mktsegment, revenue FROM (
        SELECT o_custkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY o_custkey) r
      JOIN customer ON o_custkey = c_custkey
      ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_correlated_scalar" -> """
      SELECT o.o_orderkey, o.o_custkey,
             CAST(o.o_totalprice AS DOUBLE) AS total
      FROM orders o
      WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >
        (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100)
                     AS BIGINT) // COUNT(*)
         FROM orders i WHERE i.o_custkey = o.o_custkey)""",
    "q_histogram" -> """
      SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 50000
               AS bucket,
             COUNT(*) AS cnt
      FROM part GROUP BY 1""",
    "q_sort_limit" -> """
      SELECT p_partkey, p_name, p_retailprice FROM part
      ORDER BY p_retailprice, p_partkey LIMIT 50""",
    "q_set_union" -> """
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      UNION
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""",
    "q_set_intersect" -> """
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""",
    "q_set_except" -> """
      SELECT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q_scalar_string" -> """
      SELECT p_partkey,
        UPPER(p_name) AS uname,
        LOWER(p_brand) AS lbrand,
        CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        SUBSTRING(p_type, 1, 5) AS type5,
        p_brand || '|' || p_type AS brand_type,
        REPLACE(p_name, ' ', '_') AS snake_name,
        LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key
      FROM part""",
    "q_scalar_date" -> """
      SELECT o_orderkey,
        CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        CAST(DAY(o_orderdate) AS BIGINT) AS dom,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
      FROM orders""",
    "q_scalar_math" -> """
      SELECT l_orderkey, l_linenumber,
        ABS(l_quantity - 25.0) AS dev25,
        CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * 2, 2) AS DOUBLE) AS double_price,
        CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
      FROM lineitem""",
    "q_scalar_json" -> """
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
      FROM events""",
    "q_case_when" -> """
      SELECT o_orderkey,
        CASE WHEN o_totalprice >= 200000 THEN 'high'
             WHEN o_totalprice >= 100000 THEN 'mid'
             ELSE 'low' END AS price_band
      FROM orders""",
    "q_pivot" -> """
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        COUNT(*) FILTER (WHERE event_type = 'error')    AS "error",
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        COUNT(*) FILTER (WHERE event_type = 'view')     AS "view"
      FROM events GROUP BY user_id""",
    "q_exists_subq" -> """
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""",
    "q_scalar_bits" -> """
      SELECT l_orderkey, l_partkey,
        CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt,
        (l_orderkey & 1152921504606846975) << 3 AS shl,
        l_orderkey >> 2 AS shr,
        l_orderkey & l_partkey AS band,
        l_orderkey | l_partkey AS bor,
        xor(l_orderkey, l_partkey) AS bxor,
        to_hex(l_orderkey) AS hexkey
      FROM lineitem""",
    "q_string_agg" -> """
      SELECT l_returnflag,
             string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag""",
    "q_try_arith" -> """
      SELECT l_orderkey, l_linenumber,
        CASE WHEN l_quantity - 1.0 = 0 THEN NULL
             ELSE l_extendedprice / (l_quantity - 1.0) END AS unit_price_m1,
        list_extract(str_split(l_returnflag, 'X'), 2) AS no_elem,
        TRY_CAST(CASE WHEN l_orderkey % 97 = 0 THEN l_returnflag
                      ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS mostly_int
      FROM lineitem""",
    "q_regex" -> """
      SELECT p_partkey,
        regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS noun,
        regexp_extract(p_name, '^(\w+) (\w+)$', 1) AS adj,
        array_to_string(regexp_extract_all(p_name, '[aeiou]+', 0), '-') AS vowel_runs
      FROM part
      WHERE regexp_matches(p_name, '^(small|blue) ')""",
    "q_window_firstlast" -> """
      SELECT o_custkey, o_orderkey,
        CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS drank,
        FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
        LAST_VALUE(o_orderkey) OVER w AS self_key,
        NTH_VALUE(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY o_totalprice, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_set_intersect_all" -> """
      SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS multiplicity FROM (
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        INTERSECT ALL
        SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
      GROUP BY nationkey""",
    "q_set_except_all" -> """
      SELECT custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity FROM (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      GROUP BY custkey""",
    "q4_priority_count" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        AND o.o_orderdate <  TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority""",
    "q12_priority" -> """
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag""",
    "q14_promo" -> """
      SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'""",
    "q18_large_orders" -> """
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      FROM (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0) big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q19_disjunctive" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",
    "q13_custdist" -> """
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderstatus != 'F'
        GROUP BY c_custkey) cc
      GROUP BY c_count""",
    "q15_top_supplier" -> """
      WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",
    "q17_small_qty" -> """
      WITH lp AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'),
      avgq AS (
        SELECT l_partkey,
               SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
        FROM lp GROUP BY l_partkey)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly
      FROM lp JOIN avgq USING (l_partkey)
      WHERE l_quantity < 0.2 * avg_qty""",
    // Stated in the textbook double-correlated form on purpose: the
    // Spark side's per-order aggregate must coincide with the EXISTS /
    // NOT EXISTS semantics exactly (candidate is late; some OTHER
    // supplier appears in the order; no OTHER supplier is late in it).
    "q21_waiting" -> """
      WITH lo AS (
        SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F')
      SELECT s_name, CAST(SUM(numwait) AS BIGINT) AS numwait FROM (
        SELECT l_suppkey, COUNT(*) AS numwait FROM (
          SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lo l1
          WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
            AND EXISTS (SELECT 1 FROM lo l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey != l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lo l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey != l1.l_suppkey
                              AND l3.l_shipdate > l3.o_orderdate
                                    + INTERVAL 90 DAY)) cand
        GROUP BY l_suppkey) per_supp
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 20""",
    "q22_global_sales" -> """
      WITH cust AS (
        SELECT c_custkey, CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer),
      thr AS (
        SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
               COUNT(*) AS n_pos
        FROM cust WHERE bal_cents > 0)
      SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(bal_cents) AS BIGINT) AS tot_cents
      FROM cust, thr
      WHERE bal_cents * n_pos > sum_cents
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY cntrycode""",
    // Stated in the textbook correlated-MIN form on purpose: the Spark
    // side's per-part aggregate + equality join must coincide with it.
    "q2_min_cost_supplier" -> """
      WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
                         l_suppkey AS ps_suppkey FROM lineitem),
      eu AS (
        SELECT s_suppkey, s_name, n_name,
               CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cost_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      cand AS (
        SELECT p_partkey, p_brand, s_name, n_name, cost_cents
        FROM part JOIN ps ON p_partkey = ps_partkey
        JOIN eu ON ps_suppkey = s_suppkey
        WHERE p_size <= 15 AND p_type = 'LARGE')
      SELECT CAST(cost_cents AS DOUBLE) / 100.0 AS s_acctbal,
             s_name, n_name, p_partkey, p_brand
      FROM cand c
      WHERE cost_cents = (SELECT MIN(cost_cents) FROM cand c2
                          WHERE c2.p_partkey = c.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q11_important_stock" -> """
      WITH byp AS (
        SELECT l_partkey AS ps_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS v
        FROM lineitem
        WHERE l_suppkey IN (
          SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3')
        GROUP BY 1)
      SELECT ps_partkey, CAST(v AS DOUBLE) / 10000.0 AS value
      FROM byp
      WHERE v * 1000 > (SELECT SUM(v) FROM byp)""",
    "q16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size,
             CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                   l_suppkey AS ps_suppkey FROM lineitem) ps
      JOIN part ON ps_partkey = p_partkey
      WHERE p_brand != 'Brand#5' AND p_type != 'MEDIUM'
        AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3""",
    // Textbook nested-IN form: supplier IN (pairs with excess stock),
    // part IN (name-filtered parts).
    "q20_excess_stock" -> """
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_4'
        AND s_suppkey IN (
          SELECT l_suppkey FROM (
            SELECT l_partkey, l_suppkey,
                   SUM(CASE WHEN year(l_shipdate) = 1995
                       THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS q95,
                   SUM(CASE WHEN year(l_shipdate) = 1996
                       THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS q96
            FROM lineitem
            WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            GROUP BY 1, 2) t
          WHERE q95 * 2 > q96)""",
    "q7_volume_shipping" -> """
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
          OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3""",
    "q8_market_share" -> """
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             COALESCE(CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE), 0.0)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1""",
    "q9_product_profit" -> """
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity) AS BIGINT) * 50)
               AS DOUBLE) / 10000.0 AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2""",
    "q_unpivot" -> """
      SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val
      FROM part""",
    "q_scalar_map" -> """
      SELECT event_id,
             event_type AS m_type,
             CAST(user_id AS VARCHAR) AS m_uid,
             CAST(2 AS BIGINT) AS n_keys,
             CASE WHEN event_type <= CAST(user_id AS VARCHAR)
                  THEN event_type || ',' || CAST(user_id AS VARCHAR)
                  ELSE CAST(user_id AS VARCHAR) || ',' || event_type
             END AS vals_sorted
      FROM events"""
  )
}
