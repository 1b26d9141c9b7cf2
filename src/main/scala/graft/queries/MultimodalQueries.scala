package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Twin ids live TwinOffset above their originals. */
  private val TwinOffset = 10000000L
  /** Near-dup threshold: hamming ≤ 7 over the 64-bit phash. With 8
    * bands of 8 bits, ≤ 7 differing bits CANNOT touch every band
    * (pigeonhole), so at least one band matches exactly — banded
    * candidate generation has PERFECT recall at this threshold and the
    * operator is exact, not approximate (which is what lets an oracle
    * gate it).
    */
  private val HamMax = 7L

  /** Synthesized image corpus: every image-kind document becomes a REAL
    * 16×16 PPM P6 payload whose pixel bytes cycle through the text
    * (deterministic, so the oracle recomputes every pixel from the
    * text), and every sixth doc additionally ships a TWIN — the same
    * image pushed through the REAL resize machinery (resizePpm,
    * 16×16 → 8×8). Both geometries are multiples of 8, so the twin's
    * 8×8 phash grid lands on exactly the original's sampled pixels —
    * planted near-dups at hamming 0, which is how the gate (and
    * MediaSpec's recall test) get guaranteed positives.
    *
    * ASCII-ONLY synthesis, ENFORCED (not assumed): the oracle indexes
    * text by CHARACTER while this side feeds getBytes, so the two
    * faces agree only when chars == bytes. The filter admits exactly
    * those docs (octet_length == char length ⟺ pure ASCII under
    * UTF-8) and the oracle's img CTE states the same predicate — a
    * non-ASCII document is excluded on BOTH faces instead of silently
    * hashing differently on each. No-op on the all-ASCII testdata.
    */
  /** `viaPng = true` routes the synthesized corpus through the REAL
    * compressed codec — each P6 payload is PNG-encoded then inflated
    * back through ImageIO (MediaOps.transcodeImages, the production
    * decode stage). PNG is lossless, so the round-trip is
    * value-identical to the direct path (MediaSpec asserts the phash
    * equality per image); gates keep the direct path — same numbers,
    * no inflate cost per run.
    */
  private[graft] def imageMediaRows(docs: DataFrame,
                                      viaPng: Boolean = false): Dataset[MediaOps.Media] = {
    val s = docs.sparkSession
    import s.implicits._
    val synthesized = docs
      .filter(col("doc_id") % 3 === 0 && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaOps.Media(id, "image",
          MediaOps.Codec.ppmFromBytes(text.getBytes("US-ASCII"), 16, 16))
      }
    val imgs =
      if (!viaPng) synthesized
      else MediaOps.transcodeImages(synthesized.map(m => m.copy(
        payload = MediaOps.Codec.ppmToPng(m.payload).getOrElse(m.payload))))
    val twins = MediaOps.resizeImages(imgs.filter(_.media_id % 6 == 0), 8, 8)
      .map(m => m.copy(media_id = m.media_id + TwinOffset))
    imgs.union(twins)
  }

  private def imageMedia(s: SparkSession, d: String): Dataset[MediaOps.Media] =
    imageMediaRows(Tables.documents(s, d))

  /** Synthesized audio corpus: every audio-kind document becomes a REAL
    * RIFF/WAV PCM payload (MediaOps.Codec.wavFromBytes) whose container
    * parameters are pure functions of doc_id — sample rate cycles
    * {8000, 12000, 16000} Hz over doc_id%9 and channel count mono/
    * stereo over doc_id%2 — and whose samples come from the text bytes.
    * Same ASCII-only enforcement (and reason) as imageMediaRows.
    */
  private[graft] def audioMediaRows(docs: DataFrame): Dataset[MediaOps.Media] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter(col("doc_id") % 3 === 1 && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaOps.Media(id, "audio",
          MediaOps.Codec.wavFromBytes(text.getBytes("US-ASCII"),
            8000 + 4000 * ((id % 9) / 3).toInt, 1 + (id % 2).toInt))
      }
  }

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

    // Perceptual-hash near-dup dedup over IMAGE payloads — the dedup
    // family's multimodal member (text: dedup_minhash_lsh; embeddings:
    // dedup_embedding; pixels: this). The phash is computed by the
    // native PpmPhashBands expression over the REAL P6 payloads (twins
    // went through the real resize codec), already split into 8 bands
    // of 8 bits; candidates come from ONE equi-join of the banded
    // table with itself on (band, value) — ≤ 8·256 bounded buckets,
    // never all-pairs — and ≤ HamMax verification has perfect recall
    // by pigeonhole (see HamMax), so the result is EXACT. The phash
    // table is one row of 8 ints per image: localCheckpoint (hygiene
    // device) so its four consumers share one synthesis+hash pass.
    // SCALE KNOB: banded candidate volume is ~corpus²/2^bandBits per
    // band (this is multi-index hashing; sharing ≥1 band is the
    // MINIMUM exact candidate set for a given hash size). 64-bit/8×8
    // fits this corpus; a billion-image corpus wants a wider hash —
    // e.g. a 16×16 grid → 256-bit hash → 16 bands of 16 bits: 65 536
    // buckets per band (the dedup_embedding geometry) and exactness up
    // to hamming 15. Geometry is a constant here, not a redesign.
    "mm_dedup_phash" -> ((s, d) => {
      val ph = imageMedia(s, d).toDF()
        .select(col("media_id"),
          BinaryFunctions.ppmPhashBands(col("payload")).as("bands"))
        .filter(col("bands").isNotNull)
        .localCheckpoint()
      val long = ph.select(col("media_id"),
        posexplode(col("bands")).as(Seq("bnd", "bval")))
      val cand = long.select(col("media_id").as("da"), col("bnd"), col("bval"))
        .join(long.select(col("media_id").as("db"), col("bnd"), col("bval")),
          Seq("bnd", "bval"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db")).distinct()
      cand
        .join(ph.select(col("media_id").as("da"), col("bands").as("ba")), "da")
        .join(ph.select(col("media_id").as("db"), col("bands").as("bb")), "db")
        .withColumn("hamming",
          aggregate(zip_with(col("ba"), col("bb"),
            (x, y) => bit_count(x.bitwiseXOR(y))), lit(0L), (a, x) => a + x))
        .filter(col("hamming") <= HamMax)
        .select(col("da"), col("db"), col("hamming"))
    }),

    // Transitive clustering of the IMAGE near-dup pairs — the phash
    // twin of dedup_minhash_clusters / dedup_clusters, through the SAME
    // Graphs.connectedComponents min-label loop: images linked
    // transitively by verified phash pairs share a cluster, labeled by
    // its smallest media_id. Pair generation stays banded
    // (mm_dedup_phash); clustering adds O(diameter) join+agg rounds.
    "mm_dedup_clusters" -> ((s, d) =>
      Graphs.connectedComponents(
        queries("mm_dedup_phash")(s, d).select(col("da"), col("db")))
        .select(col("id").as("media_id"), col("comp").as("cluster_id"))),

    // AUDIO metadata round-trip — the modality's driver gate (images
    // have phash/resize/transcode; this closes audio): synthesized
    // REAL WAV containers are parsed BACK by the real chunk-walking
    // parser (MediaOps.Codec.parseWav) in executor JVMs, and the gate
    // holds because the oracle states what the parse must recover —
    // every container field is a pure function of (doc_id,
    // byte-length), so DuckDB needs arithmetic, not a binary parser.
    // A synthesis/parse disagreement on any field (rate, channels,
    // per-channel sample count, byte size, floor-divided duration)
    // breaks the hash match. Fail-loud: a payload the parser rejects
    // is a task error, not a dropped row — the query's contract is
    // that everything it synthesizes parses.
    "mm_audio_meta" -> ((s, d) => {
      import s.implicits._
      audioMediaRows(Tables.documents(s, d))
        .map { m =>
          val (rate, ch, n) = MediaOps.Codec.parseWav(m.payload)
            .getOrElse(sys.error(s"synthesized WAV failed to parse: ${m.media_id}"))
          (m.media_id, m.payload.length.toLong, rate.toLong, ch.toLong,
            n.toLong, 1000L * n / rate)
        }
        .toDF("media_id", "n_bytes", "sample_rate", "channels",
          "n_samples", "duration_ms")
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
    // The parse-back result stated as arithmetic over the synthesis
    // formula: usable sample bytes truncate to a whole per-channel
    // frame count, 2 bytes per 16-bit sample, 44-byte header.
    "mm_audio_meta" -> """
      WITH a AS (
        SELECT doc_id AS media_id,
               1 + doc_id % 2 AS ch,
               8000 + 4000 * ((doc_id % 9) // 3) AS rate,
               length(text) - length(text) % (1 + doc_id % 2) AS usable
        FROM documents
        WHERE doc_id % 3 = 1 AND length(text) > 0
          AND strlen(text) = length(text))
      SELECT media_id,
             CAST(44 + 2 * usable AS BIGINT) AS n_bytes,
             CAST(rate AS BIGINT) AS sample_rate,
             CAST(ch AS BIGINT) AS channels,
             CAST(usable // ch AS BIGINT) AS n_samples,
             CAST((1000 * (usable // ch)) // rate AS BIGINT) AS duration_ms
      FROM a""",
    "mm_frame_sample" -> """
      SELECT doc_id AS media_id, k AS frame_idx,
             md5(substring(text, CAST(k * 16 + 1 AS INT), 16)) AS frame_md5
      FROM documents,
           LATERAL (SELECT unnest(range(0, CAST(CEIL(length(text) / 16.0) AS BIGINT), 4)) AS k) t""",
    // The oracle recomputes the phash straight from the text: pixel
    // byte j of the synthesized 16×16 image is text[(j % len) + 1], the
    // 8×8 grid point i samples pixel (2·(i%8), 2·(i/8)) — byte index
    // (32·(i//8) + 2·(i%8))·3 + channel — and twins share their
    // original's bands by construction (the 8×8 resize samples exactly
    // the grid pixels). Luma, mean, and band bits are the same integer
    // arithmetic as the codec; the pair join is all-pairs here (oracle
    // scale), banded in Spark.
    "mm_dedup_phash" -> s"""
      WITH $phashBandsCtes
      $phashPairsSelect""",
    // Transitive closure over the same pairs (the shared recursive-CTE
    // device of dedup_minhash_clusters / dedup_clusters), labels =
    // smallest member — the unique fixpoint the Spark min-propagation
    // loop converges to.
    "mm_dedup_clusters" -> s"""
      WITH RECURSIVE $phashBandsCtes,
      pairs AS ($phashPairsSelect),
      e AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON e2.a = r.b)
      SELECT a AS media_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a"""
  )

  /** The phash band table as WITH-body CTEs ending in
    * `bl(media_id, bs)` — shared by the pair, cluster, and streaming
    * oracles (one definition of the hash arithmetic).
    */
  private[queries] lazy val phashBandsCtes = s"""
      img AS (
        SELECT doc_id AS media_id, text FROM documents
        WHERE doc_id % 3 = 0 AND length(text) > 0
          AND strlen(text) = length(text)),
      am AS (
        SELECT media_id, text FROM img
        UNION ALL
        SELECT media_id + $TwinOffset, text FROM img WHERE media_id % 6 = 0),
      px AS (
        SELECT media_id, i,
          (299 * ascii(substring(text, ((32 * (i // 8) + 2 * (i % 8)) * 3) % length(text) + 1, 1))
         + 587 * ascii(substring(text, ((32 * (i // 8) + 2 * (i % 8)) * 3 + 1) % length(text) + 1, 1))
         + 114 * ascii(substring(text, ((32 * (i // 8) + 2 * (i % 8)) * 3 + 2) % length(text) + 1, 1)))
         // 1000 AS luma
        FROM am, LATERAL (SELECT unnest(range(0, 64)) AS i) t),
      mns AS (SELECT media_id, SUM(luma) // 64 AS mean FROM px GROUP BY media_id),
      bands AS (
        SELECT px.media_id, i // 8 AS bnd,
               SUM(CASE WHEN luma > mean THEN 1 << (i % 8) ELSE 0 END) AS bval
        FROM px JOIN mns USING (media_id)
        GROUP BY px.media_id, i // 8),
      bl AS (SELECT media_id, list(CAST(bval AS INT) ORDER BY bnd) AS bs
             FROM bands GROUP BY media_id)"""

  /** The ≤-HamMax pair join over `bl` (all-pairs at oracle scale). */
  private[queries] lazy val phashPairsSelect = s"""
      SELECT da, db, hamming FROM (
        SELECT a.media_id AS da, b.media_id AS db,
               CAST(list_sum(list_transform(range(1, 9),
                 k -> bit_count(xor(a.bs[k], b.bs[k])))) AS BIGINT) AS hamming
        FROM bl a JOIN bl b ON a.media_id < b.media_id)
      WHERE hamming <= $HamMax"""
}
