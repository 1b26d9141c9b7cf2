package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Join-family extensions past the basic flavors in RelationalQueries:
  * as-of, range/interval, cross (broadcast NLJ), and the SQL entry
  * point. Every plan is chosen for the 100 TB case:
  *
  *  - as-of is a single window pass — NO join at all. The classic
  *    as-of-join rewrite (sort-merge within partition) beats any
  *    pairwise join when the "latest prior" is per-key sequential.
  *  - the range join keeps an equi component (orderkey) so Catalyst
  *    plans a hash/SMJ join with the range as a post-condition; a pure
  *    range join against a compact interval dimension broadcasts the
  *    dimension (BroadcastNestedLoop over 80 rows — bounded).
  */
object AdvancedJoinQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AS-OF: for every event, the timestamp of the most recent PRIOR
    // 'error' event of the same user. Total order (ts, event_id) keeps
    // window frames engine-identical under timestamp ties.
    "q_join_asof" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("prev_error_ts",
          max(when(col("event_type") === "error", col("ts"))).over(w))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("prev_error_ts"))
    }),

    // RANGE (equi + interval): lineitems shipped within 60 days of
    // their order's date. The equi key carries the shuffle; the range
    // predicate evaluates post-match.
    "q_join_range" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // INTERVAL (range join, no natural equi key): orders matched into
    // generated month intervals. The scale pattern is BINNED range join
    // — derive an equi bin key (bin width = interval granularity; an
    // interval spanning k bins is exploded into k bin rows) so Catalyst
    // plans a hash join with the range predicate as a post-condition,
    // instead of a nested loop over every (fact, interval) pair.
    "q_join_interval" -> ((s, d) => {
      val months = Tables.orders(s, d).sparkSession.sql(
        """SELECT explode(sequence(TIMESTAMP'1995-01-01 00:00:00',
                                   TIMESTAMP'2001-08-01 00:00:00',
                                   INTERVAL 1 MONTH)) AS mstart""")
        .withColumn("mend", col("mstart") + expr("INTERVAL 1 MONTH"))
        .withColumn("bin", date_trunc("month", col("mstart")))
      Tables.orders(s, d)
        .withColumn("obin", date_trunc("month", col("o_orderdate")))
        .join(broadcast(months),
          col("obin") === col("bin") &&
            col("o_orderdate") >= col("mstart") &&
            col("o_orderdate") < col("mend"))
        // NTZ on the wire: the month literals are session-local
        // timestamps; NTZ keeps the parquet output naive like the oracle
        .groupBy(col("mstart").cast("timestamp_ntz").as("mstart"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
    }),

    // CROSS: the full region x nation product (broadcast NLJ; both
    // sides dimension-sized by construction).
    "q_join_cross" -> ((s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.nation(s, d).select(col("n_name")))),

    // SQL entry point: the same engine drives ANSI SQL over registered
    // views — Catalyst parses/plans identically to the DataFrame API.
    "q_sql_interface" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT year(o_orderdate) AS oyear, o_orderpriority,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders_v
        GROUP BY year(o_orderdate), o_orderpriority""")
    }),

    // LATERAL correlated subquery — top-2-per-group as a join shape:
    // for each nation, its two richest customers. Catalyst decorrelates
    // the LIMIT-bearing lateral into a per-nation rank window — the
    // same plan the hand-written rn<=2 form produces, declared in the
    // SQL form every analyst writes.
    "q_lateral_topn" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_lt")
      Tables.customer(s, d).createOrReplaceTempView("customer_lt")
      s.sql("""
        SELECT n.n_name, c.c_custkey,
               CAST(c.c_acctbal AS DOUBLE) AS bal
        FROM nation_lt n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer_lt
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""")
    }),

    // NOT IN + NULL, the ANSI three-valued-logic trap: one NULL in the
    // subquery list makes `x NOT IN (...)` UNKNOWN for every x, so the
    // whole filter yields zero "missing" rows UNLESS nulls are excluded
    // in the subquery — which this query does, and the companion count
    // demonstrates the trap by including them. Catalyst plans NOT IN as
    // a null-aware anti join (the build side tracks whether any null
    // was seen) — semantics a plain hash anti join gets wrong.
    "q_not_in_nulls" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_ni")
      Tables.customer(s, d).createOrReplaceTempView("customer_ni")
      s.sql("""
        SELECT
          (SELECT COUNT(*) FROM customer_ni
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders_ni WHERE o_orderstatus = 'F'))
            AS n_never_f,
          (SELECT COUNT(*) FROM customer_ni
           WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                          ELSE o_custkey END FROM orders_ni))
            AS n_with_null_list""")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_asof" -> """
      SELECT event_id, user_id, ts,
             MAX(CASE WHEN event_type = 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_error_ts
      FROM events""",
    "q_join_range" -> """
      SELECT l_returnflag, COUNT(*) AS cnt
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag""",
    "q_join_interval" -> """
      WITH months AS (
        SELECT mstart, mstart + INTERVAL 1 MONTH AS mend
        FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                            TIMESTAMP '2001-08-01',
                                            INTERVAL 1 MONTH)) AS mstart))
      SELECT m.mstart, COUNT(*) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders o JOIN months m
        ON o.o_orderdate >= m.mstart AND o.o_orderdate < m.mend
      GROUP BY m.mstart""",
    "q_join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation""",
    "q_sql_interface" -> """
      SELECT EXTRACT(year FROM o_orderdate) AS oyear, o_orderpriority,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY 1, 2""",
    "q_lateral_topn" -> """
      SELECT n.n_name, c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS bal
      FROM nation n,
      LATERAL (SELECT c_custkey, c_acctbal FROM customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""",
    "q_not_in_nulls" -> """
      SELECT
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
          AS n_never_f,
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN
           (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE o_custkey END FROM orders))
          AS n_with_null_list"""
  )
}
