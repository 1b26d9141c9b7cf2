package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Pins `Tables.normalizeEvents` across every storage form the driver's
  * testdata generator has actually shipped for `events.ts` — round 8 lost
  * 21 queries for a full round because the generator silently moved from
  * TIMESTAMP(NANOS) (read as long under nanosAsLong) to timestamp[us]
  * (read as TIMESTAMP_NTZ) and the loader only handled the first form.
  *
  * Contract after normalization, regardless of storage form:
  *   - `ts`    is TIMESTAMP_NTZ (naive UTC wall-clock)
  *   - `ts_ns` is epoch nanoseconds (long), consistent with `ts` at the
  *     resolution the storage carries
  */
class TablesSpec extends GraftSpec {
  import spark.implicits._

  // one known instant: 2024-03-01 12:00:00.123456 UTC
  private val micros = 1709294400123456L

  test("ns-as-long form (legacy TIMESTAMP(NANOS) parquet) normalizes") {
    val df = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    val out = Tables.normalizeEvents(df)
    assert(out.schema("ts").dataType === TimestampNTZType)
    assert(out.schema("ts_ns").dataType === LongType)
    val row = out.select(unix_micros(col("ts").cast("timestamp")), col("ts_ns")).head()
    assert(row.getLong(0) === micros)
    assert(row.getLong(1) === micros * 1000L)
  }

  test("timestamp[us] parquet (TIMESTAMP_NTZ read) normalizes — the round-8 regression") {
    val dir = tmpDir("events-ntz")
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType === TimestampNTZType) // precondition: NTZ read
    val out = Tables.normalizeEvents(back)
    assert(out.schema("ts").dataType === TimestampNTZType)
    val row = out.select(unix_micros(col("ts").cast("timestamp")), col("ts_ns")).head()
    assert(row.getLong(0) === micros)
    assert(row.getLong(1) === micros * 1000L)
  }

  test("LTZ timestamp form normalizes to the same NTZ contract") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val out = Tables.normalizeEvents(df)
    assert(out.schema("ts").dataType === TimestampNTZType)
    val row = out.select(unix_micros(col("ts").cast("timestamp")), col("ts_ns")).head()
    assert(row.getLong(0) === micros)
    assert(row.getLong(1) === micros * 1000L)
  }

  test("temporal armor: DATE and LTZ storage forms normalize to NTZ, binary text to string") {
    val dir = tmpDir("drift")
    // a future generator could ship dates as DATE, timestamps as LTZ,
    // or text as BLOB — all value-preserving forms of today's schema
    Seq((1L, micros)).toDF("k", "us")
      .select(col("k"),
        timestamp_micros(col("us")).cast("date").as("d"),
        timestamp_micros(col("us")).as("t"),
        lit("hello world").cast("binary").as("txt"))
      .write.mode("overwrite").parquet(dir)
    val out = Tables.normalizeTemporal(spark.read.parquet(dir))
    assert(out.schema("d").dataType === TimestampNTZType)
    assert(out.schema("t").dataType === TimestampNTZType)
    assert(out.schema("txt").dataType.typeName === "string")
    val row = out.select(
      unix_micros(col("d").cast("timestamp")),
      unix_micros(col("t").cast("timestamp")), col("txt")).head()
    assert(row.getLong(0) === 1709251200000000L) // midnight of that day
    assert(row.getLong(1) === micros)
    assert(row.getString(2) === "hello world")
  }

  test("every shipped table loads free of LTZ/date/binary columns (canonical types)") {
    for (n <- Tables.names) {
      val df = Tables.load(spark, "/root/testdata/sf0.001", n)
      val offenders = df.schema.fields.filter(f =>
        Set("date", "timestamp", "binary").contains(f.dataType.typeName))
      assert(offenders.isEmpty,
        s"$n carries non-canonical columns: ${offenders.map(_.name).mkString(",")}")
    }
  }

  test("the shipped testdata events table loads and the ts_ns/ts pair agree") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampNTZType)
    val bad = ev.filter(unix_micros(col("ts").cast("timestamp")) * 1000L =!= col("ts_ns")).count()
    assert(bad === 0L)
  }
}
