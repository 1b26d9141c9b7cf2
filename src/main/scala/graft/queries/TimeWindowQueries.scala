package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time window aggregations over `events` — the batch-observable
  * faces of the streaming operators in graft.streaming.StreamOps (the
  * same groupBy(window(...)) plans run unchanged under readStream; the
  * streaming ≡ batch equivalence is asserted in StreamingSpec).
  *
  * Oracle parity: Spark's `window()` is epoch-aligned, so a 1-hour
  * tumbling window start equals DuckDB `date_trunc('hour', ts)`; sliding
  * windows enumerate the two epoch-aligned 30-min starts; session
  * windows are the classic gaps-and-islands rewrite with the SAME gap
  * comparison (`>= gap` starts a new session, matching Spark's
  * half-open [start, last+gap) merge rule).
  */
object TimeWindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour windows per event_type: partial-aggregated hash
    // agg; the shuffle carries (#windows x #types) rows per partition.
    "q_tumbling_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("cnt"), col("sum_value"))),

    // Sliding 1-hour windows every 30 minutes: each event lands in
    // exactly two epoch-aligned windows.
    "q_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))),

    // Session windows: 2-hour-gap sessions per user. Spark's
    // session_window end is last-event + gap.
    "q_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("session_window.start").as("sstart"),
          col("session_window.end").as("send"), col("cnt")))
  )

  val oracle: Map[String, String] = Map(
    "q_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS wstart, event_type,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2""",
    "q_sliding_window" -> """
      SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS wstart,
             event_type, COUNT(*) AS cnt
      FROM events CROSS JOIN (VALUES (0), (1)) t(o)
      GROUP BY 1, 2""",
    "q_session_window" -> """
      WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '2 hours'
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id, MIN(ts) AS sstart,
             MAX(ts) + INTERVAL '2 hours' AS send, COUNT(*) AS cnt
      FROM sessions GROUP BY user_id, sid"""
  )
}
