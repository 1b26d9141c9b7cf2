package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BinaryFunctions
import graft.multimodal.MediaOps

/** Multimodal operators over binary payload columns, oracle-gated.
  * Payloads here are the documents' utf-8 bytes (pure ASCII in the
  * testdata, so the DuckDB oracle can mirror byte ops with VARCHAR
  * functions — octet == char); real deployments read true media bytes
  * with the same plans.
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String): DataFrame =
    MediaOps.mediaFromDocuments(Tables.documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typed metadata extraction: one narrow projection over the scan.
    "mm_metadata" -> ((s, d) =>
      media(s, d).select(
        col("media_id"), col("kind"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum"))),

    // One-pass byte statistics via the native BinaryByteStats
    // expression; integer sums keep the oracle exact.
    "mm_byte_stats" -> ((s, d) => {
      val st = BinaryFunctions.byteStats(col("payload"))
      media(s, d)
        .withColumn("st", st)
        .select(
          col("media_id"),
          col("st.n_bytes").as("n_bytes"),
          col("st.sum_bytes").as("sum_bytes"),
          col("st.min_byte").as("min_byte"),
          col("st.max_byte").as("max_byte"),
          // exact integer ppm: ROUND on small-denominator rationals hits
          // .5 ties that Spark and DuckDB resolve differently
          expr("(1000000 * st.sum_bytes) div st.n_bytes").as("mean_byte_ppm"))
    }),

    // Frame sampling: fixed 16-byte frames, every 4th frame fingerprinted
    // — the video-pipeline shape (decode → sample → per-frame feature),
    // all inside one generate + projection, no shuffle.
    "mm_frame_sample" -> ((s, d) =>
      media(s, d)
        .withColumn("nf",
          ceil(octet_length(col("payload")) / lit(16.0)).cast("long"))
        .select(col("media_id"), col("payload"),
          explode(sequence(lit(0L), col("nf") - 1, lit(4L))).as("frame_idx"))
        .select(
          col("media_id"), col("frame_idx"),
          md5(col("payload").substr(
            (col("frame_idx") * 16 + 1).cast("int"), lit(16))).as("frame_md5")))
  )

  val oracle: Map[String, String] = Map(
    "mm_metadata" -> """
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             CAST(length(text) AS BIGINT) AS n_bytes,
             md5(text) AS checksum
      FROM documents""",
    "mm_byte_stats" -> """
      WITH b AS (
        SELECT doc_id AS media_id,
               list_transform(range(1, length(text) + 1),
                              i -> ascii(substring(text, i, 1))) AS bs
        FROM documents)
      SELECT media_id,
             CAST(len(bs) AS BIGINT) AS n_bytes,
             CAST(list_sum(bs) AS BIGINT) AS sum_bytes,
             list_min(bs) AS min_byte,
             list_max(bs) AS max_byte,
             CAST((1000000 * CAST(list_sum(bs) AS BIGINT)) // len(bs) AS BIGINT) AS mean_byte_ppm
      FROM b""",
    "mm_frame_sample" -> """
      SELECT doc_id AS media_id, k AS frame_idx,
             md5(substring(text, CAST(k * 16 + 1 AS INT), 16)) AS frame_md5
      FROM documents,
           LATERAL (SELECT unnest(range(0, CAST(CEIL(length(text) / 16.0) AS BIGINT), 4)) AS k) t"""
  )
}
