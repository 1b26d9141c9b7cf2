package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.Tables

/** Oracle-gated queries that execute a REAL Structured Streaming job:
  * `readStream` over the parquet table → stateful aggregation →
  * checkpointed memory sink, drained with `Trigger.AvailableNow` (the
  * deterministic batch-equivalent trigger), then returned as the
  * query's result. The DuckDB oracle states the same aggregate in plain
  * SQL — proving streaming ≡ batch on the driver's own gate, not just
  * in unit tests.
  *
  * `maxFilesPerTrigger`/`maxBytesPerTrigger` are deliberately NOT set
  * here: with AvailableNow the source still plans bounded batches, and
  * the state store carries counts across micro-batches exactly as the
  * reference's recoverable `map[string]int` did (SURVEY.md §2.3 A1/A2).
  */
object StreamingGateQueries {

  private val runId = new AtomicLong(0L)

  /** Run a streaming aggregation over a table dir and hand back its
    * complete result. Checkpoint is a throwaway temp dir — each gate
    * run is a fresh pipeline; recovery semantics are covered by
    * StreamingSpec's kill/restart test.
    */
  private def runStream(s: SparkSession, path: String,
                        normalize: DataFrame => DataFrame,
                        agg: DataFrame => DataFrame): DataFrame = {
    val name = s"gate_stream_${runId.incrementAndGet()}"
    val ckpt = Files.createTempDirectory(s"graft-ckpt-$name").toString
    // The file stream source wants a directory; the driver tables are
    // single parquet files. A temp dir with a symlink keeps the read
    // zero-copy.
    val srcDir = Files.createTempDirectory(s"graft-src-$name")
    Files.createSymbolicLink(srcDir.resolve("part-0.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    val schema = s.read.parquet(path).schema
    val src = normalize(s.readStream.schema(schema).parquet(srcDir.toString))
    val q = agg(src).writeStream
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    q.awaitTermination()
    s.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // App-2's stateful keyed count as a genuine streaming job.
    "stream_count_by_key" -> ((s, d) => {
      Tables.load(s, d, "region") // warms session confs (tune) before readStream
      runStream(s, s"$d/events.parquet", Tables.normalizeEvents,
        df => df.groupBy(col("event_type").as("key"))
          .agg(count(lit(1)).as("cnt")))
    }),

    // Event-time tumbling window aggregation with a watermark, streamed.
    "stream_tumbling_window" -> ((s, d) => {
      Tables.load(s, d, "region")
      runStream(s, s"$d/events.parquet", Tables.normalizeEvents,
        // watermarks require an instant (TIMESTAMP); the UTC session
        // makes the NTZ→LTZ cast value-preserving
        df => df.withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").cast("timestamp_ntz").as("wstart"),
            col("event_type"), col("cnt")))
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_count_by_key" ->
      "SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY event_type",
    "stream_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS wstart, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2"""
  )
}
