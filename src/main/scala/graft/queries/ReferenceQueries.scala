package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Core

/** SURVEY.md §2 reference surface, expressed over the driver testdata
  * tables. Every entry has a DuckDB oracle; patterns (the reference's CLI
  * `pattern` argument) are baked-in constants so results are
  * deterministic.
  *
  * The reference streams raw text lines as (key, value) string pairs
  * (rainstorm/types.go:53-57); we reproduce that shape from columnar
  * tables via Core.sourceScan so the operator semantics (substring filter
  * over the whole line, CSV re-parse inside the operator) stay faithful
  * while the physical execution is a columnar parquet scan.
  */
object ReferenceQueries {

  private def docLines(s: SparkSession, d: String): DataFrame =
    Core.sourceScan(Tables.documents(s, d), "documents", col("doc_id"), col("text"))

  /** lineitem rendered as the reference's raw CSV line stream (string/int
    * columns only so the rendering is engine-portable). */
  private def lineitemLines(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.select(
      concat(lit("lineitem:"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("key"),
      concat_ws(",",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        col("l_returnflag"),
        col("l_linestatus")).as("value"))
  }

  private val lineCsvSchema = StructType(Seq(
    StructField("okey", LongType),
    StructField("lineno", IntegerType),
    StructField("rflag", StringType),
    StructField("lstatus", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 — text-file line scan (rainstorm/server.go:411-448)
    "source_scan" -> ((s, d) => docLines(s, d)),

    // F1 — filter(contains) (ops/app1op1/app1op1.go:14-17)
    "filter_contains" -> ((s, d) => Core.filterContains("join")(docLines(s, d))),

    // F2 — CSV parse + projection (ops/app1op2/app1op2.go:11-18)
    "project_csv" -> ((s, d) =>
      Core.projectCsv(lineCsvSchema, Seq("okey", "rflag"))(lineitemLines(s, d))),

    // F3 — filter(equality) + project-to-pair (ops/app2op1/app2op1.go:11-21)
    "filter_eq_project" -> ((s, d) =>
      Core.filterEqProject(col("event_type"), "click", col("user_id"))(Tables.events(s, d))),

    // F5 — exactly-once dedup (rainstorm/server.go:292-298): duplicate the
    // input (simulating redelivery) then dedup by id; identical copies make
    // the survivor deterministic.
    "dedup_by_id" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Core.dedupById(Seq("doc_id"))(docs.unionAll(docs))
    }),

    // A1 — keyed count (rainstorm/server.go:344-355), batch-observable form
    "count_by_key" -> ((s, d) =>
      Core.countByKey(Tables.events(s, d).select(col("event_type").as("key")))),

    // App-1 end-to-end: scan → filter(contains) → csv project (SURVEY §2.6)
    "app1_pipeline" -> ((s, d) =>
      Core.pipeline(lineitemLines(s, d),
        Core.filterContains("R"),
        Core.projectCsv(lineCsvSchema, Seq("okey", "rflag")))),

    // App-2 end-to-end: scan → filter(eq)+project → count_by_key (SURVEY §2.6)
    "app2_pipeline" -> ((s, d) =>
      Core.pipeline(Tables.orders(s, d),
        Core.filterEqProject(col("o_orderstatus"), "O", col("o_orderpriority")),
        df => Core.countByKey(df)))
  )

  val oracle: Map[String, String] = Map(
    "source_scan" ->
      "SELECT 'documents:' || CAST(doc_id AS VARCHAR) AS key, text AS value FROM documents",
    "filter_contains" ->
      "SELECT 'documents:' || CAST(doc_id AS VARCHAR) AS key, text AS value FROM documents WHERE text LIKE '%join%'",
    "project_csv" ->
      "SELECT l_orderkey AS okey, l_returnflag AS rflag FROM lineitem",
    "filter_eq_project" ->
      "SELECT CAST(user_id AS VARCHAR) AS key, CAST(1 AS BIGINT) AS one FROM events WHERE event_type = 'click'",
    "dedup_by_id" ->
      "SELECT * FROM documents",
    "count_by_key" ->
      "SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY event_type",
    "app1_pipeline" ->
      """SELECT l_orderkey AS okey, l_returnflag AS rflag FROM lineitem
         WHERE (CAST(l_orderkey AS VARCHAR) || ',' || CAST(l_linenumber AS VARCHAR) || ',' || l_returnflag || ',' || l_linestatus) LIKE '%R%'""",
    "app2_pipeline" ->
      "SELECT o_orderpriority AS key, COUNT(*) AS cnt FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority"
  )
}
