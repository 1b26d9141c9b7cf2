package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedJoinQueries, CurationQueries, MultimodalQueries, ReferenceQueries, RelationalQueries, StreamingGateQueries, TextQueries, TimeWindowQueries, VectorQueries}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` is the union of the per-area registries; each area object
  * pairs a Spark implementation with a DuckDB oracle over the same
  * parquet tables. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** private[graft]: RegistrySpec derives both the union size and the
    * per-area sum from THIS list, so a new area object registers in
    * exactly one place and the overlap check can never drift from it.
    */
  private[graft] val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ReferenceQueries.queries, ReferenceQueries.oracle),
      (RelationalQueries.queries, RelationalQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (CurationQueries.queries, CurationQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (TimeWindowQueries.queries, TimeWindowQueries.oracle),
      (MultimodalQueries.queries, MultimodalQueries.oracle),
      (AdvancedJoinQueries.queries, AdvancedJoinQueries.oracle),
      (StreamingGateQueries.queries, StreamingGateQueries.oracle)
    )

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0.
    * App-2 shape (scan → filter → keyed count) — the reference's
    * flagship demo (SURVEY.md §2.6).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("app2_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
