package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video handled as opaque
  * `binary` payload columns with typed metadata, processed in batched
  * partition iterators (the JVM analogue of mapInPandas-style
  * vectorized UDFs: one decoder instantiation per batch, records
  * streamed through it, no driver collection).
  *
  * The actual codecs are STUBBED — this container ships no image/audio
  * libraries — behind `Codec`, a deterministic fake that "decodes" a
  * payload into stable pseudo-features. The Spark-side contract (binary
  * schema, partition batching, feature struct shape) is real and
  * tested; swapping `Codec.decode` for a JNI/FFI codec is the only
  * change a real deployment needs.
  */
object MediaOps {

  /** An opaque media record: payload plus typed metadata. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded per-media features (what a real codec would extract:
    * dimensions/duration become byte-derived fakes here).
    */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, n_frames: Int, signature: Long)

  /** STUB codec. A production build replaces `decode` with the real
    * library call (e.g. JPEG decode → pixel stats; PCM decode →
    * spectral stats). Deterministic on payload bytes so tests and
    * oracles are stable.
    */
  object Codec {
    val FrameBytes = 16

    def decode(m: Media): MediaFeatures = {
      val bytes = m.payload
      var sum = 0L
      var sig = 1469598103934665603L // FNV-1a offset basis
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        sig = (sig ^ b) * 1099511628211L
        i += 1
      }
      val n = bytes.length
      MediaFeatures(
        m.media_id, m.kind, n.toLong,
        if (n == 0) 0.0 else sum.toDouble / n,
        (n + FrameBytes - 1) / FrameBytes,
        sig)
    }
  }

  /** Present `documents` as a media table: payload = utf-8 bytes, kind
    * assigned deterministically. At 100 TB the payload column would be
    * real image/audio bytes read from parquet/lance; everything
    * downstream is agnostic to that.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** Batched decode: each partition streams through the codec in
    * batches of `batchSize` (decoder state amortized per batch, bounded
    * memory). This is the mapInPandas shape on the JVM: iterator-of-
    * batches in, iterator-of-results out, executed per partition with
    * no shuffle.
    */
  def decodeFeatures(ds: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { records =>
      records.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here (native handles etc.)
        batch.iterator.map(Codec.decode)
      }
    }
  }
}
