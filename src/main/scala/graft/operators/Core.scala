package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's operator algebra (SURVEY.md §2) as pure
  * `DataFrame => DataFrame` combinators.
  *
  * The reference (SatyamS17/StreamProcessing) models everything as a keyed
  * string-pair stream `Record{ID, Key, Value}` (rainstorm/types.go:53-57)
  * flowing through a fixed 3-stage pipeline source → op1 → op2 → sink
  * (rainstorm/server.go:88-153). Here each stage is a declarative
  * transformation, so Catalyst gets to push filters into the scan, prune
  * columns before the shuffle, and keep the whole pipeline inside
  * whole-stage codegen — the things the reference's authors did by hand
  * (early filter in op1) or couldn't do at all (per-record RPC + process
  * spawn).
  *
  * Scale notes: none of these collect to the driver; `countByKey` is a
  * hash aggregation with map-side partial aggregation, so the shuffle
  * carries one row per (partition, key), not per input record.
  */
object Core {

  /** Record schema of the reference stream (rainstorm/types.go:53-57). */
  case class Record(id: String, key: String, value: String)

  /** S1 source scan: present any table as the reference's (key, value)
    * line stream. Key mirrors `"<srcFile>:<lineNo>"`
    * (rainstorm/server.go:439) using a stable row identifier instead of a
    * physical line number (line numbers don't exist in a distributed
    * columnar scan — and must not: they'd serialize the read).
    */
  def sourceScan(df: DataFrame, src: String, idCol: Column, valueCol: Column): DataFrame =
    df.select(
      concat(lit(src), lit(":"), idCol.cast("string")).as("key"),
      valueCol.as("value"))

  /** F1 filter(contains): σ(value contains pattern)
    * (ops/app1op1/app1op1.go:14-17). Catalyst `Contains` predicate —
    * pushed down to the parquet scan when value is a stored column.
    */
  def filterContains(pattern: String)(df: DataFrame): DataFrame =
    df.filter(col("value").contains(pattern))

  /** F2 CSV parse + projection (ops/app1op2/app1op2.go:11-18): parse
    * `value` as one CSV record against `schema`, drop malformed rows
    * (Go encoding/csv error → drop, app1op2.go:13-15), project `fields`.
    */
  def projectCsv(schema: StructType, fields: Seq[String])(df: DataFrame): DataFrame = {
    val parsed = df.withColumn(
      "_parsed",
      // escape=" selects RFC-4180 doubled-quote escaping, matching Go's
      // encoding/csv used by the reference ops (ops/app1op2/app1op2.go:11).
      from_csv(col("value"), schema, Map("mode" -> "PERMISSIVE", "escape" -> "\"")))
    // PERMISSIVE + null-out: a malformed row yields nulls for all fields;
    // dropping rows where every projected field is null reproduces the
    // reference's malformed-row drop without a second parse.
    val projected = parsed.select(fields.map(f => col(s"_parsed.$f").as(f)): _*)
    projected.na.drop("all", fields)
  }

  /** F3 filter(equality) + project-to-pair (ops/app2op1/app2op1.go:11-21):
    * σ(filterCol == pattern) ∘ π(keyCol AS key, 1 AS one).
    */
  def filterEqProject(filterCol: Column, pattern: String, keyCol: Column)(df: DataFrame): DataFrame =
    df.filter(filterCol === pattern)
      .select(keyCol.cast("string").as("key"), lit(1L).as("one"))

  /** F4 general flat-map contract (rainstorm/server.go:334-361): any
    * executable may emit 0..k records per input. Spark-side this is just
    * a typed flatMap; exposed for tests/extensions.
    */
  def flatMapRecords(df: DataFrame, fn: Record => IterableOnce[Record]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("key"), col("value")).as[Record].flatMap(fn).toDF()
  }

  /** F5 exactly-once dedup (rainstorm/server.go:292-298): drop records
    * whose id was already processed. Spark: hash-partitioned
    * deduplication; at scale this is one shuffle on the id and bounded
    * state per partition (streaming: pair with a watermark).
    */
  def dedupById(idCols: Seq[String])(df: DataFrame): DataFrame =
    df.dropDuplicates(idCols)

  /** A1 keyed running count (rainstorm/server.go:344-355): the engine's
    * COUNT protocol. Batch form — final counts per key; streaming form
    * lives in graft.streaming (update-mode groupBy.count, the state store
    * replacing the reference's `map[string]int` + WAL).
    */
  def countByKey(df: DataFrame): DataFrame =
    df.groupBy(col("key")).agg(count(lit(1)).as("cnt"))

  /** A1 under key skew: two-phase salted aggregation. Phase 1 spreads a
    * hot key over `buckets` sub-keys (map-side salt from a per-row id,
    * no extra shuffle), phase 2 folds the partial counts. Output is
    * identical to countByKey; the shuffle carries `buckets` rows per hot
    * key instead of routing the whole key to one reducer. Join-side skew
    * is covered separately by AQE skew-join splitting (GraftSession).
    */
  def countByKeySalted(df: DataFrame, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(col("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("cnt"))

  /** The RainStorm 3-stage pipeline template (rainstorm/server.go:88-153):
    * source → op1 → op2 (→ sink is the caller's write). Composition is
    * associative function application; Catalyst fuses all stages into one
    * scan-side pipeline up to the first aggregation's shuffle.
    */
  def pipeline(source: DataFrame,
               op1: DataFrame => DataFrame,
               op2: DataFrame => DataFrame): DataFrame =
    op2(op1(source))
}
