package graft

import org.apache.spark.sql.functions._

import graft.functions.BinaryFunctions
import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.{Codec, Media}

/** Specs for the multimodal plumbing: binary schema flow, batched
  * partition decode, codec determinism, and agreement between the
  * mapPartitions path and the native byte-stats expression.
  */
class MediaSpec extends GraftSpec {
  import spark.implicits._

  private val sample = Seq(
    Media(0L, "image", "hello world".getBytes("UTF-8")),
    Media(1L, "audio", Array.tabulate(100)(i => (i % 251).toByte)),
    Media(2L, "video", Array.emptyByteArray))

  test("decodeFeatures preserves ids and computes frame counts") {
    val out = MediaOps.decodeFeatures(sample.toDS(), batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L).n_bytes === 11L)
    assert(out(0L).n_frames === 1)  // 11 bytes -> one 16-byte frame
    assert(out(1L).n_frames === 7)  // 100 bytes -> ceil(100/16)=7
    assert(out(2L).n_frames === 0)
  }

  test("codec is deterministic on payload bytes") {
    val a = Codec.decode(sample(1))
    val b = Codec.decode(sample(1).copy())
    assert(a === b)
  }

  test("mapPartitions decode agrees with the native byte-stats expression") {
    val viaCodec = MediaOps.decodeFeatures(sample.toDS())
      .select(col("media_id"), col("n_bytes"), col("mean_byte"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaExpr = sample.toDS().toDF()
      .withColumn("st", BinaryFunctions.byteStats(col("payload")))
      .select(col("media_id"), col("st.n_bytes"),
        when(col("st.n_bytes") === 0, 0.0)
          .otherwise(col("st.sum_bytes").cast("double") / col("st.n_bytes")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaCodec === viaExpr)
  }

  test("byteStats handles unsigned bytes and empty payloads") {
    val df = Seq(
      (1L, Array(0xff.toByte, 0x00.toByte)),
      (2L, Array.emptyByteArray)).toDF("id", "payload")
      .withColumn("st", BinaryFunctions.byteStats(col("payload")))
    val r1 = df.filter(col("id") === 1).select("st.*").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getInt(2), r1.getInt(3)) ===
      ((2L, 255L, 0, 255)))
    val r2 = df.filter(col("id") === 2).select("st.*").head()
    assert(r2.getLong(0) === 0L && r2.isNullAt(2) && r2.isNullAt(3))
  }
}
