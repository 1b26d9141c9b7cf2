package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst keeps predicate pushdown
  * and column pruning; the only normalization is `events.ts`, which is
  * stored as parquet TIMESTAMP(NANOS). Spark reads it as a long (ns since
  * epoch, see GraftSession) and we expose both the raw nanos and a
  * microsecond TimestampType column `ts` (truncation, matching what any
  * µs-resolution engine sees).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTemporal(normalizeEvents(df))
    else normalizeTemporal(df)
  }

  /** Generator-drift armor for the non-events tables (the round-8
    * lesson generalized): temporal columns normalize to TIMESTAMP_NTZ
    * whatever storage form they arrive in — DATE (midnight), LTZ
    * timestamp (micros unchanged under the UTC session), or the NTZ
    * they carry today — and BINARY text columns decode to STRING (the
    * corpus is ASCII; byte-identical). Value-preserving by
    * construction, so oracle parity is unaffected FOR TODAY'S
    * already-canonical data; what it buys is that a generator type
    * shift can never again fail 20 queries at analysis.
    * Scope note: this armor is Spark-side only. The DuckDB oracle
    * reads the raw parquet, so an actual future storage shift would
    * surface as an oracle-side type/schema mismatch — LOUDLY, as
    * per-query errors in the correctness artifact, not as the silent
    * analysis-failure shrink this closes (and tools/check_oracle.py
    * applies the matching canonicalization on its side). TablesSpec
    * pins each drift form.
    */
  private[graft] def normalizeTemporal(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType.typeName match {
        case "date" | "timestamp" =>
          acc.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        case "binary" =>
          acc.withColumn(f.name, col(f.name).cast("string"))
        case _ => acc
      }
    }

  /** events with `ts` as a proper µs TimestampType plus `ts_ns` raw nanos. */
  private[graft] def normalizeEvents(df: DataFrame): DataFrame = {
    val tsType = df.schema("ts").dataType.typeName
    if (tsType == "long") {
      // Integer division — ns values (~1.7e18) overflow double precision,
      // so `/ 1000` (double div) would corrupt the microseconds. NTZ to
      // match the other tables' naive parquet timestamps (UTC session).
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz"))
    } else {
      // µs-resolution parquet (timestamp[us], no tz) reads as TIMESTAMP_NTZ;
      // unix_micros needs LTZ. The session timezone is UTC, so the NTZ→LTZ
      // cast is a no-op on the underlying microseconds.
      df.withColumn("ts", col("ts").cast("timestamp_ntz"))
        .withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
