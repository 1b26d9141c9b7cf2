package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset-assembly operators of an LLM training-data pipeline —
  * the steps that come AFTER cleaning/dedup (TextQueries) and decide
  * what actually ships in a training run: reproducible sampling,
  * train/val/test splitting, benchmark decontamination, and
  * token-budget packing.
  *
  * Portability contract: the sampler/splitter hash is a pure-integer
  * LCG over doc_id (both engines compute it bit-identically); on a real
  * deployment you would swap in `xxhash64(doc_id)` — the plan shape
  * (stateless narrow scan) is identical, only the mixing constant
  * changes. Decontamination n-grams are md5 over the joined words
  * (md5 is bit-identical across engines).
  *
  * Scale design: sample/split are shuffle-FREE narrow scans (the
  * decision is a pure function of doc_id, so it needs no coordination
  * and no sort — the property that makes hash-splitting the standard
  * over random()+seed, which is neither reproducible across retries
  * nor partitioning-stable). Decontamination broadcasts only the
  * benchmark-bounded gram set, so the 100 TB train side is never
  * shuffled with its payload — at worst its 16-byte ids shuffle for
  * the final anti-join. Packing partitions by an explicit shard key
  * so each window is independent — the global-order single-partition
  * window trap does not appear.
  */
object CurationQueries {

  /** Pure-integer LCG bucket in [0, 100) — the shared Portable.bucket
    * high-bit device (one definition across every deterministic
    * sampler; code-review r14).
    */
  private def bucket100(id: Column): Column = Portable.bucket(id, 100L)

  private val bucketSql = Portable.bucketSql("doc_id", 100L)

  /** Tokenized docs: (doc_id, w array) — TextQueries' tokenizer,
    * shared so decontamination/packing token counts can never drift
    * from the cleaning queries'.
    */
  private def docWords(s: SparkSession, d: String): DataFrame =
    TextQueries.docWords(s, d)

  private val wordsSql =
    """list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"""

  /** Word n-gram fingerprints (md5 of space-joined window) — the
    * decontamination key. N = 3: long enough that a shared gram means
    * shared phrasing, short enough to catch partial quotes.
    */
  private val GramN = 3

  private def grams(w: Column): Column =
    when(size(w) >= GramN,
      transform(sequence(lit(1), size(w) - (GramN - 1)),
        i => md5(concat_ws(" ",
          (0 until GramN).map(k => element_at(w, i + lit(k))): _*)
          .cast("binary"))))
      .otherwise(array().cast("array<string>"))

  private val gramsSql = {
    val parts = (0 until GramN).map(k => s"w[i + $k]").mkString(", ")
    s"CASE WHEN len(w) >= $GramN THEN " +
      s"list_transform(range(1, len(w) - ${GramN - 1} + 1), " +
      s"i -> md5(concat_ws(' ', $parts))) ELSE [] END"
  }

  /** Benchmark membership: a deterministic doc_id slice stands in for
    * the eval set (in production: an actual benchmark table).
    */
  private val BenchMod = 97L

  /** Bloom decontamination geometry (docs_decontaminate_bloom): BloomM
    * bits, BloomK probes per gram. Sized so k·n/m stays small at gate
    * scale (n ≈ 13k bench grams at sf0.1 → per-gram FP ≈ 5e-5, well
    * under one false-positive DOC per corpus) — at deployment m scales
    * with the benchmark suite exactly like any Bloom filter. The
    * false-positive TRADE is measured, not assumed: CurationSpec runs
    * the same operator at m = 2^14 where collisions are forced and
    * pins the no-false-negative contract at both geometries.
    */
  private[graft] val BloomM = 1L << 20
  private val BloomK = 3

  /** Portable gram→integer hash: the text_rolling_hash polynomial fold
    * (base 31, mod 1e9+7) over the gram's characters — grams are md5
    * hex strings, so the fold runs over a fixed 32-char alphabet and
    * both engines compute it bit-identically (ints stay < 2^62).
    */
  private def gramIntHash(g: Column): Column =
    aggregate(transform(split(g, ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31L + c) % 1000000007L)

  private val gramIntHashSql =
    """list_reduce(list_prepend(0, list_transform(range(1, len(g) + 1),
         j -> CAST(ascii(substring(g, j, 1)) AS BIGINT))),
         (a, c) -> (a * 31 + c) % 1000000007)"""

  /** Bloom probe family: Kirsch–Mitzenmacher double hashing,
    * pos_i = (h1 + i · step) mod m, with h1 and step derived from h by
    * PRODUCTS of two LCG states ((lcg(h+c1) · lcg(h+c2)) >> 16 — a
    * quadratic form in h). The nonlinearity is load-bearing: every
    * composition of LCG steps is AFFINE in h, so a first cut that
    * probed G(h+i) for an LCG-built G gave ALL grams probe triples
    * with a common difference pattern — one start-bin collision set
    * all k probes at once and the measured FP rate was n/m instead of
    * (kn/m)^k, geometry-independent (36 identical false positives at
    * m=2^20 and 2^16 on the gate corpus). With per-gram products the
    * (h1, step) pairs decorrelate across grams and the measured rates
    * match the textbook curve (zero at 2^20, forced handful at 2^14 —
    * CurationSpec). step is forced odd (·2+1), so for power-of-two m
    * the k probes are distinct positions. All values stay positive
    * BIGINTs < 2^62 — products of two < 2^31 states — and `>>`/`%`
    * agree across engines on nonnegative values. Offsets are the
    * 1000th/10000th/100000th primes (seed decorrelation only).
    */
  private def bloomFields(h: Column, m: Long): (Column, Column) = (
    shiftright(Portable.lcg(h) * Portable.lcg(h + lit(7919L)), 16) % m,
    shiftright(Portable.lcg(h + lit(104729L))
      * Portable.lcg(h + lit(1299709L)), 16) % m * 2L + 1L)

  private def bloomPos(h1: Column, step: Column, i: Int, m: Long): Column =
    (h1 + lit(i.toLong) * step) % m

  private def bloomFieldsSql(m: Long): (String, String) = (
    s"(((${Portable.lcgSql("(h)")} * ${Portable.lcgSql("(h + 7919)")}) >> 16) % $m)",
    s"((((${Portable.lcgSql("(h + 104729)")} * ${Portable.lcgSql("(h + 1299709)")}) >> 16) % $m) * 2 + 1)")

  private def bloomPosColSql(m: Long): String =
    s"((h1 + i * step) % $m)"

  /** docs_decontaminate_bloom's body with the bit-count a measurement
    * knob (the registered gate pins BloomM; CurationSpec forces
    * collisions at a small m). Same output contract as the exact
    * docs_decontaminate — the drop-in replacement.
    */
  private[graft] def decontaminateBloom(s: SparkSession, d: String,
                                        m: Long = BloomM): DataFrame = {
    val dw = docWords(s, d)
    val isBench = col("doc_id") % BenchMod === 0L
    def withFields(df: DataFrame): DataFrame = {
      val (h1, step) = bloomFields(col("h"), m)
      df.withColumn("h1", h1).withColumn("step", step)
    }
    def posArr =
      array((0 until BloomK).map(i =>
        bloomPos(col("h1"), col("step"), i, m)): _*)
    // the "bitmap": distinct set positions — ≤ BloomK · |bench grams|
    // rows of fixed-width integers (at deployment: a literal m-bit
    // array); broadcast like the exact query's gram set, but carrying
    // 8-byte ints instead of variable-length gram text
    val refBits = withFields(
      dw.filter(isBench)
        .select(explode(grams(col("w"))).as("g")).distinct()
        .select(gramIntHash(col("g")).as("h")))
      .select(explode(posArr).as("p")).distinct()
    // a train gram is flagged iff ALL BloomK probes hit set positions:
    // count surviving probe rows per (doc, gram) — duplicate probe
    // positions within a gram count per PROBE (exact Bloom semantics:
    // a repeated index re-checks the same bit)
    val contaminated = withFields(
      dw.filter(!isBench)
        .select(col("doc_id"), explode(grams(col("w"))).as("g")).distinct()
        .select(col("doc_id"), col("g"), gramIntHash(col("g")).as("h")))
      .select(col("doc_id"), col("g"), explode(posArr).as("p"))
      .join(broadcast(refBits), "p")
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === BloomK)
      .select(col("doc_id")).distinct()
    dw.filter(!isBench)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
  }

  /** docs_profile_sketch sizing: KMV buffer (k longs per column) and
    * the hash domain — 7 hex digits of md5, i.e. [0, 2^28).
    */
  private val ProfileK = 256
  private val ProfileDomain = 268435456L // 2^28

  /** Chunking geometry: ChunkWords-token windows every ChunkStride
    * tokens (25% overlap) — the RAG/context-window prep shape.
    */
  private val ChunkWords = 32
  private val ChunkStride = 24

  /** Occurrence packing for chunk-level dedup: occurrence id =
    * doc_id · 2^20 + chunk_id. Valid while chunk_id < 2^20 (docs up to
    * ~25 M words at stride 24) and doc_id < 2^43 — both far beyond any
    * real document corpus; past them, widen to a struct min. The
    * domain is GUARDED at runtime (packGuard): an out-of-range id
    * raises instead of silently corrupting the decoded survivors.
    */
  private val ChunkPack = 1048576L
  /** doc_id bound for the occurrence pack: 2^43 (so doc_id·2^20 +
    * chunk_id stays inside a signed long). */
  private val ChunkPackMaxDoc = 8796093022208L

  /** Runtime domain guard for packed-key encodings: evaluates to
    * `packed` when `id` is inside [0, bound), raises otherwise — the
    * cost is one branch per row, the alternative is silent corruption
    * past the documented domain. raise_error's NullType coerces into
    * the long branch, and because the guard feeds the packed value
    * itself it can never be pruned from the plan.
    */
  /** Token-budget pack tail shared by docs_pack and the curation
    * composite (code-review r15 — the geometry lived in four copies):
    * shard count derived from the total token mass (>= PackShardFloor,
    * ~PackShardTokens tokens per shard — a lazy one-row broadcast,
    * never a collect), the doc_id-residue shard key, and the greedy
    * running-sum bin window. `tok` must carry (doc_id, tokCol).
    * Output: (doc_id, shard, tokCol, bin).
    */
  private[graft] def packBins(tok: DataFrame, tokCol: String): DataFrame = {
    val ns = tok.agg(greatest(lit(PackShardFloor),
      expr(s"sum($tokCol) div $PackShardTokens")).as("ns"))
    tok.crossJoin(broadcast(ns))
      .select(col("doc_id"), (col("doc_id") % col("ns")).as("shard"),
        col(tokCol))
      .withColumn("bin",
        expr(s"(sum($tokCol) over " +
          s"(partition by shard order by doc_id " +
          s"rows between unbounded preceding and current row) " +
          s"- $tokCol) div $PackBudget"))
  }

  /** Oracle twin of [[packBins]] over a named (doc_id, tokCol) CTE —
    * the trailing SELECT of a WITH chain (pshards/psharded mirror the
    * Spark tail's one-row aggregate and shard projection).
    */
  private def packTailSql(src: String, tokCol: String): String = s"""
      pshards AS (
        SELECT CAST(GREATEST($PackShardFloor,
                 SUM($tokCol) // $PackShardTokens) AS BIGINT) AS ns
        FROM $src),
      psharded AS (
        SELECT doc_id,
               CAST(doc_id % (SELECT ns FROM pshards) AS BIGINT) AS shard,
               $tokCol
        FROM $src)
      SELECT doc_id, shard, $tokCol,
        CAST((SUM($tokCol) OVER
                (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - $tokCol) // $PackBudget AS BIGINT) AS bin
      FROM psharded"""

  private def packGuard(id: Column, bound: Long, what: String,
                        packed: Column): Column =
    when(id < 0L || id >= bound,
      raise_error(concat(lit(s"$what out of packed-key domain [0, $bound): "),
        id.cast("string"))).cast("long"))
      .otherwise(packed)

  /** (doc_id, chunk_id, n_words, chunk_fp) chunk rows from a
    * (doc_id, text) frame. Pure projection + Generate (narrow), so the
    * SAME definition runs over batch and streaming frames —
    * docs_chunk, dedup_chunks, and the streaming chunk-dedup gate all
    * chunk through here and can never drift apart.
    */
  private[graft] def chunkRows(docs: DataFrame): DataFrame = {
    val (c, st) = (ChunkWords, ChunkStride)
    docs.select(col("doc_id"), TextQueries.words(col("text")).as("w"))
      .withColumn("len", size(col("w")).cast("long"))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L),
          expr(s"CASE WHEN len > $c THEN (len - $c + $st - 1) div $st ELSE 0 END")))
          .as("chunk_id"))
      .withColumn("chunk",
        slice(col("w"), (col("chunk_id") * st + 1).cast("int"), lit(c)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_words"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
  }

  /** (doc_id, cid, n_words, chunk_fp) CONTENT-DEFINED chunk rows from
    * a (doc_id, text) frame — the shift-robust chunking device behind
    * dedup_cdc_chunks: a word ENDS a chunk iff the last hex digit of
    * its md5 is '0' (p = 1/16, expected ~16-word chunks), so chunk
    * boundaries are a pure function of content and an edit perturbs
    * only its own chunk (CurationSpec pins the locality).
    *
    * Pure-ARRAY construction: boundary positions → slice spans →
    * per-span fingerprints, entirely in higher-order functions over
    * the row's own word array, then ONE narrow Generate to emit chunk
    * rows. No window, no explode-regroup — nothing shuffles until a
    * consumer aggregates — and (unlike a cumulative window) the
    * construction is legal over STREAMING frames, which is what the
    * stream_dedup_cdc_chunks gate runs. Each HOF stage materializes as
    * its own column (lambda bodies get no subexpression elimination —
    * the repo-wide HOF rule).
    */
  private[graft] def cdcChunkRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextQueries.words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      // 0-based positions whose word ends a chunk
      .withColumn("bpos", cdcBoundaryPos(col("w")))
      .withColumn("spans", cdcSpans(col("w"), col("bpos")))
      .select(col("doc_id"),
        posexplode(cdcChunkStructs(col("w"), col("spans")))
          .as(Seq("cid", "chunk")))
      .select(col("doc_id"), col("cid").cast("long").as("cid"),
        col("chunk.n_words").as("n_words"), col("chunk.chunk_fp").as("chunk_fp"))

  /** CDC stage 1: 0-based positions whose word ends a chunk (the
    * boundary rule — last md5 hex digit '0', p = 1/16). Shared by
    * cdcChunkRows and the cdc_chunks SQL function: ONE definition of
    * the rule.
    */
  private[graft] def cdcBoundaryPos(w: Column): Column =
    filter(
      transform(w, (wd, i) =>
        when(substring(md5(wd.cast("binary")), 32, 1) === "0", i)
          .otherwise(lit(-1))),
      p => p >= 0)

  /** CDC stage 2: inclusive [s, e] spans from the boundary positions.
    * span k = [starts(k), ends(k)]; the trailing span after the last
    * boundary covers the tail (empty when the last word IS a boundary
    * — filtered here).
    */
  private[graft] def cdcSpans(w: Column, bpos: Column): Column =
    filter(zip_with(
        concat(array(lit(0)), transform(bpos, p => p + 1)),
        concat(bpos, array(size(w) - 1)),
        (s, e) => struct(s.as("s"), e.as("e"))),
      c => c("e") >= c("s"))

  /** CDC stage 3: per-span struct(n_words, chunk_fp). */
  private[graft] def cdcChunkStructs(w: Column, spans: Column): Column =
    transform(spans, c => struct(
      (c("e") - c("s") + 1).cast("long").as("n_words"),
      md5(concat_ws(" ",
        slice(w, c("s") + 1, c("e") - c("s") + 1)).cast("binary"))
        .as("chunk_fp")))

  /** The whole CDC construction as ONE scalar column —
    * `array<struct<n_words bigint, chunk_fp string>>` over a text
    * column — the form behind the `cdc_chunks(text)` SQL function
    * (GraftExtensions), so the shift-robust chunker is reachable from
    * the SQL interface. Composes the SAME three stage functions
    * cdcChunkRows uses (zero drift, spec-pinned equal); the nesting
    * recomputes `w` inside each lambda that references it (no CSE in
    * lambda bodies — the repo-wide HOF rule), the price of a scalar
    * form; plan-shaped pipelines should keep using cdcChunkRows'
    * staged columns. Empty/whitespace-only text yields an empty array
    * (natural scalar semantics; the row-generator instead filters
    * empty docs before exploding).
    */
  private[graft] def cdcChunkArray(text: Column): Column = {
    val w = TextQueries.words(text)
    cdcChunkStructs(w, cdcSpans(w, cdcBoundaryPos(w)))
  }

  /** The chunks CTEs as a WITH-body fragment over a caller-chosen
    * source relation — the SQL twin of chunkRows, shared by every
    * chunk-consuming oracle (the streaming composite chunks only the
    * curation-kept docs; everything else chunks `documents`).
    */
  private[graft] def chunksCtesFrom(from: String): String = s"""
      dw AS (SELECT doc_id, $wordsSql AS w FROM $from),
      sized AS (
        SELECT doc_id, w, CAST(len(w) AS BIGINT) AS len
        FROM dw WHERE len(w) > 0),
      chunks AS (
        SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
          CAST(len(list_slice(w, k * $ChunkStride + 1,
               k * $ChunkStride + $ChunkWords)) AS BIGINT) AS n_words,
          md5(array_to_string(list_slice(w, k * $ChunkStride + 1,
                              k * $ChunkStride + $ChunkWords), ' ')) AS chunk_fp
        FROM sized, LATERAL (
          SELECT unnest(range(0,
            CASE WHEN len > $ChunkWords
                 THEN (len - $ChunkWords + $ChunkStride - 1) // $ChunkStride
                 ELSE 0 END + 1)) AS k) t)"""

  /** The whole-corpus chunks CTE (the common case). */
  private[queries] val chunksSql = s"WITH ${chunksCtesFrom("documents")}"

  /** CONTENT-DEFINED chunks as a WITH-body fragment ending in
    * `cdc(doc_id, cid, n_words, chunk_fp)` — the SQL twin of
    * cdcChunkRows, shared by the batch dedup oracle and the streaming
    * twin's (one definition of the boundary rule). The window form
    * here is value-equal to the Scala side's span construction: cid =
    * boundaries strictly before the word.
    */
  private[graft] val cdcChunksCtes = s"""
      cdw AS (SELECT doc_id, $wordsSql AS w FROM documents),
      cwr AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
        FROM (SELECT doc_id, w FROM cdw WHERE len(w) > 0),
             LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) t),
      cfl AS (
        SELECT doc_id, pos, word,
               CASE WHEN substring(md5(word), 32, 1) = '0' THEN 1 ELSE 0 END AS brk
        FROM cwr),
      ccid AS (
        SELECT doc_id, pos, word,
               CAST(COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cid
        FROM cfl),
      cdc AS (
        SELECT doc_id, cid, CAST(COUNT(*) AS BIGINT) AS n_words,
               md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_fp
        FROM ccid GROUP BY doc_id, cid)"""

  /** Per-language stratified sample size. */
  private val StratumK = 25L

  /** Packing budget (tokens per training sequence bin). */
  private[graft] val PackBudget = 512L
  /** Packing shard sizing: shard count = max(floor, total_tokens div
    * target) — DERIVED from corpus scale, so per-shard window volume is
    * bounded by ~PackShardTokens at any corpus size (a constant shard
    * count would grow per-window state linearly with the corpus); the
    * floor keeps a parallelism minimum at small SFs.
    */
  private val PackShardFloor = 32L
  private val PackShardTokens = 65536L

  /** Two-pass distributed-rank sizing: per-source rank buckets =
    * max(floor, corpus_rows div target-rows-per-bucket) — the bucket
    * count grows with the corpus so no rank sort ever exceeds
    * ~RankBucketRows rows per task.
    */
  private val RankBucketFloor = 16L
  private val RankBucketRows = 65536L

  /** Oracle SQL for split/decontaminate, shared by their own entries
    * and the end-to-end composite (one definition, zero drift).
    */
  /** The 80/10/10 split as a pure column / SQL CASE over an id —
    * shared by docs_split and the streaming composite gate.
    */
  private[graft] def splitCol(id: Column): Column =
    when(bucket100(id) < 80, "train")
      .when(bucket100(id) < 90, "val")
      .otherwise("test")

  private[graft] val splitCaseSql =
    s"""CASE WHEN $bucketSql < 80 THEN 'train'
             WHEN $bucketSql < 90 THEN 'val'
             ELSE 'test' END"""

  private val splitSql = s"""
      SELECT doc_id, $splitCaseSql AS split
      FROM documents"""

  private val deconSql = s"""
      WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
      bench_grams AS (
        SELECT DISTINCT unnest($gramsSql) AS g
        FROM dw WHERE doc_id % $BenchMod = 0),
      train_grams AS (
        SELECT doc_id, unnest($gramsSql) AS g
        FROM dw WHERE doc_id % $BenchMod != 0),
      contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM train_grams t JOIN bench_grams b ON t.g = b.g)
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens
      FROM dw
      WHERE doc_id % $BenchMod != 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)"""

  /** Oracle twin of decontaminateBloom at bit-count `m` — the same
    * hash fold, probe arithmetic (i as a range column — identical
    * values to the Spark side's literal 0..BloomK-1), bitmap set, and
    * all-probes-hit count, statement for statement.
    */
  private def bloomDeconSql(m: Long) = s"""
      WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
      bg AS (SELECT DISTINCT g FROM
        (SELECT unnest($gramsSql) AS g FROM dw WHERE doc_id % $BenchMod = 0)),
      bh AS (SELECT h, ${bloomFieldsSql(m)._1} AS h1,
                    ${bloomFieldsSql(m)._2} AS step
             FROM (SELECT $gramIntHashSql AS h FROM bg)),
      ki AS (SELECT unnest(range(0, $BloomK)) AS i),
      bpos AS (SELECT DISTINCT ${bloomPosColSql(m)} AS p FROM bh, ki),
      tg AS (SELECT DISTINCT doc_id, g FROM
        (SELECT doc_id, unnest($gramsSql) AS g FROM dw
         WHERE doc_id % $BenchMod != 0)),
      th AS (SELECT doc_id, g, ${bloomFieldsSql(m)._1} AS h1,
                    ${bloomFieldsSql(m)._2} AS step
             FROM (SELECT doc_id, g, $gramIntHashSql AS h FROM tg)),
      tpos AS (SELECT doc_id, g, ${bloomPosColSql(m)} AS p FROM th, ki),
      contaminated AS (
        SELECT DISTINCT doc_id FROM (
          SELECT t.doc_id, t.g, COUNT(*) AS nhit
          FROM tpos t JOIN bpos b ON t.p = b.p
          GROUP BY 1, 2) c
        WHERE nhit = $BloomK)
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens
      FROM dw
      WHERE doc_id % $BenchMod != 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Reproducible 10% sample: pure function of doc_id, so the same
    // rows survive re-runs, retries, and repartitioning — no shuffle,
    // no sort, no RNG state. THE way to subsample a 100 TB corpus.
    "docs_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), bucket100(col("doc_id")).as("bucket"))
        .filter(col("bucket") < 10)),

    // Deterministic 80/10/10 train/val/test assignment from the same
    // hash — membership is stable under corpus growth (a doc's split
    // never changes when other docs are added), which random splitting
    // cannot give.
    "docs_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), splitCol(col("doc_id")).as("split"))),

    // Benchmark decontamination: drop every training doc that shares a
    // word n-gram with the (tiny) benchmark set. The gram join
    // broadcasts the BENCHMARK side — bounded by the eval set, so safe
    // to hint — and the train side streams through map-side. The final
    // anti-join's `contaminated` set is train-derived and therefore
    // UNBOUNDED (adversarially, every doc could share a gram); no
    // broadcast hint there — AQE broadcasts it when it measures small
    // and falls back to a shuffled anti-join (16-byte ids only) when
    // it doesn't.
    "docs_decontaminate" -> ((s, d) => {
      val dw = docWords(s, d)
      val isBench = col("doc_id") % BenchMod === 0L
      val benchGrams = dw.filter(isBench)
        .select(explode(grams(col("w"))).as("g")).distinct()
      val contaminated = dw.filter(!isBench)
        .select(col("doc_id"), explode(grams(col("w"))).as("g"))
        .join(broadcast(benchGrams), "g")
        .select(col("doc_id")).distinct()
      dw.filter(!isBench)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
    }),

    // Bloom-filter decontamination — the 100 TB shape of the query
    // above (Bloom 1970; the standard membership pre-filter in
    // web-scale dedup/decontamination systems): the benchmark side
    // collapses to a FIXED-GEOMETRY bit set (BloomM bits, BloomK
    // probes per gram — here the distinct set-position table, ≤ k·n
    // integer rows; at deployment a literal m-bit bitmap whose size is
    // chosen, not data-driven), and a training gram is contaminated
    // iff all its probes hit. No false negatives EVER (an exact-
    // contaminated gram's probes are all set by construction — the
    // spec pins kept ⊆ exact-kept at two geometries); false positives
    // are the measured trade (CurationSpec forces them at m = 2^14 and
    // records the rate; at the registered m they measure ZERO on the
    // gate corpus). Every arithmetic step is the repo's portable
    // integer toolkit (ascii polynomial fold; double-hashed probes
    // with quadratic LCG-product mixing — see bloomFields for why the
    // nonlinearity is load-bearing), so even the false positives are
    // deterministic and the oracle hash-matches them.
    "docs_decontaminate_bloom" -> ((s, d) => decontaminateBloom(s, d)),

    // Deterministic training-order interleaving: position p of a doc is
    // (rank-within-source − 1) · #sources + source-index — round-robin
    // across sources, so a training run never sees a long single-source
    // block (ordering bias) and the order is reproducible. Scale shape:
    // NO global sort and NO per-source corpus-sized window — per-source
    // rank is the TWO-PASS DISTRIBUTED RANK: the rank key h is a
    // uniform hash, so equal-width buckets on h are balanced WITHOUT a
    // sampling pass (b is a pure function of the row — unlike
    // repartitionByRange, whose sampled boundaries can differ between
    // the two plan branches that consume them); pass 1 aggregates
    // per-(source, bucket) counts (≤ nsrc·B rows), a cumulative window
    // over that bounded table yields each bucket's prefix offset, and
    // pass 2 ranks locally within (source, bucket) — each sort task
    // sees ~corpus/(nsrc·B) rows, with B derived from corpus size so
    // that stays ~RankBucketRows at any scale.
    "docs_interleave" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // global windows — but over the DISTINCT source table (dimension-
      // sized at any SF), the same post-aggregation pattern as the
      // quantile thresholds; no driver action, no corpus-wide window
      val src = docs.select(col("source")).distinct()
        .withColumn("sidx", row_number().over(
          Window.orderBy(col("source"))).cast("long") - 1L)
        .withColumn("nsrc", count(lit(1)).over(
          Window.partitionBy()).cast("long"))
      val sized = docs.select(col("doc_id"), col("source"),
        Portable.lcg(col("doc_id")).as("h"))
      // bucket count from corpus size (lazy one-row aggregate — no
      // driver action); b = h·B div 2^31 is monotone in h, so
      // bucket-prefix-offset + local rank ≡ global per-source rank
      val nb = sized.agg(greatest(lit(RankBucketFloor),
        expr(s"count(1) div $RankBucketRows")).as("nb"))
      val bucketed = sized.crossJoin(broadcast(nb))
        .withColumn("b", expr(s"(h * nb) div ${Portable.LcgM}"))
      val offs = bucketed.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.partitionBy(col("source")).orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("b"), col("off"))
      // no broadcast hint on offs: its size is nsrc·B (corpus-derived,
      // ~GB at extreme scale), AQE broadcasts it while it measures
      // small, and a broadcast would buy nothing anyway — the rank
      // window needs a (source, b) exchange that a shuffled join
      // already provides (Catalyst reuses the join's partitioning)
      val ranked = bucketed.join(offs, Seq("source", "b"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source"), col("b"))
            .orderBy(col("h"), col("doc_id"))).cast("long") + col("off"))
      ranked.join(broadcast(src), "source")
        .select(col("doc_id"), col("source"),
          ((col("rn") - 1L) * col("nsrc") + col("sidx")).as("pos"))
    }),

    // The end-to-end assembly composite: curated docs (language +
    // quality + canonical-copy, from TextQueries.docs_curation) that
    // also survive benchmark decontamination, split 80/10/10, reduced
    // to per-split doc and token budgets — the numbers a training run
    // is provisioned from, and the proof that the pipeline stages
    // COMPOSE: each stage below is literally the same public operator
    // the driver gates individually, joined on doc_id. At 100 TB the
    // joins carry (doc_id, n_tokens) pairs only — never text.
    "docs_e2e_pipeline" -> ((s, d) => {
      val cur = TextQueries.queries("docs_curation")(s, d)
        .select(col("doc_id"), col("n_tokens"))
      val dec = queries("docs_decontaminate")(s, d).select(col("doc_id"))
      val spl = queries("docs_split")(s, d)
      cur.join(dec, "doc_id").join(spl, "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),

    // Data mixing: rebalance the corpus to target per-language weights
    // by deterministic fractional up/downsampling — the step that sets
    // a training run's mixture proportions. A doc with weight w emits
    // floor(w) copies plus one more for the hash-chosen frac(w) slice
    // (en 0.5x, es 2x, everything else 1x here). Same LCG bucket as
    // docs_sample, so the mixture is reproducible and membership-stable;
    // the copy explode is a narrow Generate — still no shuffle.
    "docs_mixture" -> ((s, d) => {
      val w = typedLit(Map("en" -> 0.5, "es" -> 2.0))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("wt", coalesce(element_at(w, col("lang")), lit(1.0)))
        .withColumn("copies",
          floor(col("wt")).cast("long") +
            when(bucket100(col("doc_id"))
              < ((col("wt") - floor(col("wt"))) * 100).cast("long"), 1L)
              .otherwise(0L))
        .filter(col("copies") > 0)
      docs.select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("copies"))).as("copy_idx"))
    }),

    // Stratified sampling: a fixed-size, deterministic sample PER
    // LANGUAGE (the balanced-eval-set builder) — the k docs with the
    // lowest portable hash in each language, via the BOUNDED-STATE
    // k-min aggregate (Aggregators.MinKDistinctAggregator, the KMV
    // buffer): the aggregation buffer never holds more than k values
    // per (partition, lang) and partials merge exactly, so no stratum
    // ever sorts its full id set in one task (the window row_number
    // form does — with ~3 strata that's the whole corpus in 3 tasks).
    // The rank key packs (h, doc_id) into one long — h < 2^31 and the
    // doc_id row ordinal < 2^31, so h·2^31 + doc_id orders exactly like
    // (h, doc_id); for id spaces past 2^31 widen the pack to a struct
    // min-k.
    "docs_stratified_sample" -> ((s, d) => {
      // packGuard: the (h, doc_id) pack decodes via ckv % LcgM, which is
      // wrong for doc_id ≥ 2^31 — raise there instead of silently
      // returning corrupted ids (widen to a struct min-k past that).
      val ck = packGuard(col("doc_id"), Portable.LcgM, "doc_id",
        Portable.lcg(col("doc_id")) * Portable.LcgM + col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), ck.as("ck"))
        .groupBy(col("lang"))
        .agg(graft.functions.Aggregators.minKDistinct(StratumK.toInt)(col("ck"))
          .as("mins"))
        .select(col("lang"), posexplode(col("mins")).as(Seq("p", "ckv")))
        .select((col("ckv") % Portable.LcgM).as("doc_id"), col("lang"),
          (col("p") + 1).cast("long").as("rn"))
    }),

    // Overlapping-window chunking: each document explodes into
    // ChunkWords-token windows every ChunkStride tokens — the step
    // that turns documents into retrieval/training sequences. The last
    // chunk starts at the last stride boundary that still adds new
    // tokens: chunk count = 1 + ceil((len - C)/S), all in integer
    // arithmetic. A narrow scan + Generate — per-document work only,
    // no shuffle at any corpus size.
    "docs_chunk" -> ((s, d) =>
      chunkRows(Tables.documents(s, d).select(col("doc_id"), col("text")))),

    // Cross-document SUB-document dedup (the CCNet-style shared-passage
    // removal): of all chunks with the same fingerprint, keep the
    // single globally-first occurrence (min (doc_id, chunk_id)) and
    // record how many copies it displaced. Whole-doc dedup
    // (dedup_exact/minhash) misses boilerplate pasted into
    // otherwise-distinct documents; chunk granularity catches it.
    // Scale shape: chunks derive scan-side (docs_chunk's narrow
    // Generate) and the ONLY exchange is the groupBy on the 16-byte
    // fingerprint carrying one packed 8-byte occurrence id (map-side
    // min/count combine) — chunk text never shuffles, and the
    // survivors decode straight out of the aggregate.
    "dedup_chunks" -> ((s, d) =>
      queries("docs_chunk")(s, d)
        .select(col("chunk_fp"),
          packGuard(col("chunk_id"), ChunkPack, "chunk_id",
            packGuard(col("doc_id"), ChunkPackMaxDoc, "doc_id",
              col("doc_id") * ChunkPack + col("chunk_id"))).as("packed"))
        .groupBy(col("chunk_fp"))
        .agg(min(col("packed")).as("keep"), count(lit(1)).as("n_copies"))
        .select(expr(s"keep div $ChunkPack").as("doc_id"),
          (col("keep") % ChunkPack).as("chunk_id"),
          col("chunk_fp"), col("n_copies"))),

    // CONTENT-DEFINED chunk dedup — the shift-robust member of the
    // chunk-dedup family (the storage-dedup / repeated-passage device:
    // fixed-stride chunks lose every downstream fingerprint when one
    // word is inserted, because all boundaries shift; content-defined
    // boundaries are a pure function of the words themselves, so an
    // edit perturbs only the chunk containing it — everything after
    // the next boundary re-aligns; CurationSpec pins the locality).
    // A word ENDS a chunk iff the last hex digit of md5(word) is '0'
    // (p = 1/16 → expected ~16-word chunks; md5 is bit-identical on
    // both engines, making the boundary rule fully oracle-portable).
    // Chunk id = boundaries BEFORE the word, via a per-document
    // cumulative window — an ENTITY-keyed window (state bounded by
    // document length, never corpus size), the same class as every
    // other window in this file. Chunk text reassembles by sorting the
    // collected (pos, word) structs — deterministic under any shuffle
    // arrival order. Output mirrors dedup_chunks: first occurrence by
    // packed (doc_id, chunk_id), copy count per distinct chunk.
    "dedup_cdc_chunks" -> ((s, d) =>
      cdcChunkRows(Tables.documents(s, d).select(col("doc_id"), col("text")))
        .select(col("chunk_fp"), col("n_words"),
          packGuard(col("cid"), ChunkPack, "cdc chunk_id",
            packGuard(col("doc_id"), ChunkPackMaxDoc, "doc_id",
              col("doc_id") * ChunkPack + col("cid"))).as("packed"))
        .groupBy(col("chunk_fp"))
        .agg(min(col("packed")).as("keep"), count(lit(1)).as("n_copies"),
          min(col("n_words")).as("n_words"))
        .select(expr(s"keep div $ChunkPack").as("doc_id"),
          (col("keep") % ChunkPack).as("chunk_id"),
          col("chunk_fp"), col("n_copies"), col("n_words"))),

    // Token-budget packing: greedy contiguous fill of PackBudget-token
    // bins, independently per shard. bin = tokens-before-this-doc div
    // budget — the distributed form of "append until the bin is full,
    // then start the next" (an oversized doc overflows its own bin and
    // the next doc starts fresh, exactly like the sequential greedy).
    // Shard count is DERIVED from the corpus token total (lazy one-row
    // aggregate, no driver action), so each shard's running-sum window
    // holds ~PackShardTokens tokens at any corpus size — a constant
    // shard count would serialize 1/32 of a 100 TB corpus per task.
    "docs_pack" -> ((s, d) =>
      packBins(docWords(s, d).select(
        col("doc_id"), size(col("w")).cast("long").as("n_tokens")),
        "n_tokens")),

    // FULL-STACK curation mega-composite on the TRAINED quantizer
    // (r13 verdict #7 / r14 Next #6) — the end-to-end chain a
    // training-data run actually ships: language + quality gate and
    // exact-dup canonicalization (docs_curation), SEMANTIC dedup under
    // the Lloyd-trained coarse quantizer (dedup_semdedup_kmeans's DROP
    // set anti-joined on vec_id ≡ doc_id — dedup keeps by default, so
    // a document with no embedding row has no semantic-dup evidence
    // and passes through, exactly as docs outside every candidate pair
    // do in the text-dedup families; at sf0.1 the embedding table
    // covers 2 000 of 5 000 docs, so the anti-join — not an inner
    // join — is what keeps the composite a CURATION of the corpus
    // rather than a restriction to the embedded slice),
    // ExactSubstr token CUTTING (the span inventory's
    // dup_tokens subtracted from each survivor's budget — Lee et al.
    // cut spans, not documents), n-gram benchmark decontamination,
    // and token-budget packing of what survives — ONE registered plan.
    //
    // Scale shape: every stage is the registered operator's own plan
    // (each already individually adjudicated for 100 TB), composed by
    // doc_id equi-joins that carry ONLY (doc_id, token counts) — text
    // never crosses a stage boundary; the full-text scans are the
    // gate's scan-side filter chain and the span family's gram
    // explode, exactly as in the standalone queries. The final pack
    // windows partition by the derived shard key (~PackShardTokens
    // tokens per shard at any corpus size), so no global sort appears.
    // At 100 TB each stage would also be independently
    // checkpointable — the composite is the plan a production run
    // materializes between stages; registered un-materialized so the
    // oracle gates the WHOLE chain's semantics end to end.
    "docs_curation_e2e_kmeans" -> ((s, d) => {
      val cur = TextQueries.queries("docs_curation")(s, d)
        .select(col("doc_id"), col("n_tokens"))
      val semDropped = VectorQueries.queries("dedup_semdedup_kmeans")(s, d)
        .filter(col("kept") === 0L)
        .select(col("vec_id").as("doc_id"))
      val dec = queries("docs_decontaminate")(s, d).select(col("doc_id"))
      val spans = TextQueries.queries("dedup_substring_spans")(s, d)
        .select(col("doc_id"), col("dup_tokens"))
      val kept = cur
        .join(semDropped, Seq("doc_id"), "left_anti")
        .join(dec, "doc_id")
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L)))
            .as("kept_tokens"))
      packBins(kept, "kept_tokens")
    }),

    // Incremental ingest dedup — the nightly-batch production shape: a
    // new-arrivals slice is deduplicated AGAINST the historical store
    // and within itself, without re-deduplicating the store. The store
    // contributes only its DISTINCT 16-byte fingerprints (never text),
    // so however large the history grows the anti-join shuffles
    // fingerprint-width rows, and Spark's runtime bloom filter can
    // additionally pre-filter the store by the (small) arrivals side.
    // The arrivals slice is a deterministic doc_id residue so the gate
    // is reproducible (in production: the new date partition). Within
    // the batch, first-arrival survives per fingerprint — the
    // dedup_exact rule, scoped to the delta.
    "dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = docs.filter(col("doc_id") % 4L =!= 0L)
        .select(md5(col("text").cast("binary")).as("fp")).distinct()
      val arrivals = docs.filter(col("doc_id") % 4L === 0L)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      arrivals.join(store, Seq("fp"), "left_anti")
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_batch_copies"))
        .select(col("keep_id"), col("fp"), col("n_batch_copies"))
    }),

    // One-pass column profiler — the data-quality monitor a pipeline
    // runs over every new drop: per column, row/null/distinct counts,
    // min/max, and total rendered length. ONE scan feeds every
    // statistic (parallel aggregate expressions, not per-column
    // passes); the multi-column COUNT(DISTINCT)s plan as Spark's
    // single Expand + one shuffle — the standard exact shape. At
    // 100 TB you swap the exact distincts for the KMV sketch
    // q_sketch_approx proves oracle-portable and keep everything else.
    // The one-row aggregate is unpivoted into a row per column by
    // exploding a literal struct array — no driver round-trip.
    "docs_profile" -> ((s, d) => {
      val profiled = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = profiled.flatMap { c => Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        sum(length(col(c).cast("string"))).as(s"${c}__len")) }
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(explode(array(profiled.map(c => struct(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col(s"${c}__nn")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_val"),
          col(s"${c}__max").as("max_val"),
          col(s"${c}__len").as("sum_len"))): _*)).as("p"))
        .select(col("p.*"))
    }),

    // The profiler's 100 TB distinct-count path, SHIPPED rather than
    // promised: docs_profile's exact COUNT(DISTINCT)s (an Expand that
    // multiplies the shuffle by the column count) swap for per-column
    // KMV sketches — constant state (k=256 longs per column), one
    // ordinary partial-aggregated pass, NO Expand. The hash is the
    // first 7 hex digits of md5 over the rendered value (domain 2^28)
    // — md5 is bit-identical across engines, so unlike
    // approx_count_distinct's HLL the estimate itself is
    // oracle-exact (the q_sketch_approx/q_kmv_distinct device, here
    // over arbitrary-typed columns).
    "docs_profile_sketch" -> ((s, d) => {
      val profiled = Seq("doc_id", "text", "lang", "source", "n_chars")
      def h(c: String): Column =
        conv(substring(md5(col(c).cast("string").cast("binary")), 1, 7),
          16, 10).cast("long")
      val aggs = profiled.flatMap { c => Seq(
        count(col(c)).as(s"${c}__nn"),
        graft.functions.Aggregators.minKDistinct(ProfileK)(h(c))
          .as(s"${c}__mins")) }
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(explode(array(profiled.map(c => struct(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col(s"${c}__nn")).as("n_nulls"),
          when(size(col(s"${c}__mins")) < ProfileK,
            size(col(s"${c}__mins")).cast("long"))
            .otherwise(expr(
              // pre-multiplied in Scala: INT*INT literals overflow
              // under ANSI; the product is one BIGINT literal
              s"${(ProfileK - 1) * ProfileDomain} div " +
                s"element_at(${c}__mins, $ProfileK)"))
            .as("est_distinct"))): _*)).as("p"))
        .select(col("p.*"))
    }))

  val oracle: Map[String, String] = Map(
    "docs_sample" -> s"""
      SELECT doc_id, CAST($bucketSql AS BIGINT) AS bucket
      FROM documents WHERE $bucketSql < 10""",
    "docs_split" -> splitSql,
    "docs_decontaminate" -> deconSql,
    "docs_decontaminate_bloom" -> bloomDeconSql(BloomM),
    "docs_interleave" -> s"""
      WITH src AS (
        SELECT source,
          ROW_NUMBER() OVER (ORDER BY source) - 1 AS sidx,
          COUNT(*) OVER () AS nsrc
        FROM (SELECT DISTINCT source FROM documents)),
      ranked AS (
        SELECT doc_id, source,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY ${Portable.lcgSql("doc_id")}, doc_id) AS rn
        FROM documents)
      SELECT r.doc_id, r.source,
        CAST((r.rn - 1) * s.nsrc + s.sidx AS BIGINT) AS pos
      FROM ranked r JOIN src s ON s.source = r.source""",
    "docs_e2e_pipeline" -> s"""
      WITH cur AS (${TextQueries.oracle("docs_curation")}),
      dec AS ($deconSql),
      spl AS ($splitSql)
      SELECT spl.split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(cur.n_tokens) AS BIGINT) AS n_tokens
      FROM cur
      JOIN dec ON dec.doc_id = cur.doc_id
      JOIN spl ON spl.doc_id = cur.doc_id
      GROUP BY spl.split""",
    "docs_mixture" -> s"""
      WITH weighted AS (
        SELECT doc_id, lang,
          CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 2.0 ELSE 1.0 END AS wt
        FROM documents),
      counted AS (
        SELECT doc_id, lang,
          CAST(FLOOR(wt) AS BIGINT)
            + CASE WHEN $bucketSql < CAST((wt - FLOOR(wt)) * 100 AS BIGINT)
                   THEN 1 ELSE 0 END AS copies
        FROM weighted)
      SELECT doc_id, lang, CAST(i AS BIGINT) AS copy_idx
      FROM counted, LATERAL (SELECT unnest(range(1, copies + 1)) AS i) t
      WHERE copies > 0""",
    "docs_stratified_sample" -> s"""
      SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
        SELECT doc_id, lang,
          ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY ${Portable.lcgSql("doc_id")},
                     doc_id) AS rn
        FROM documents)
      WHERE rn <= $StratumK""",
    "docs_chunk" -> s"""
      $chunksSql
      SELECT doc_id, chunk_id, n_words, chunk_fp FROM chunks""",
    "dedup_chunks" -> s"""
      $chunksSql
      SELECT CAST(keep // $ChunkPack AS BIGINT) AS doc_id,
             CAST(keep % $ChunkPack AS BIGINT) AS chunk_id,
             chunk_fp, CAST(n_copies AS BIGINT) AS n_copies
      FROM (SELECT chunk_fp, MIN(doc_id * $ChunkPack + chunk_id) AS keep,
                   COUNT(*) AS n_copies
            FROM chunks GROUP BY chunk_fp)""",
    // The SQL twin of the CDC construction: same boundary rule (last
    // md5 hex digit '0' ends a chunk), same preceding-boundary count
    // for chunk ids, same packed first-occurrence dedup (cdcChunksCtes
    // is the one shared definition, as with chunksCtesFrom).
    "dedup_cdc_chunks" -> s"""
      WITH $cdcChunksCtes
      SELECT CAST(keep // $ChunkPack AS BIGINT) AS doc_id,
             CAST(keep % $ChunkPack AS BIGINT) AS chunk_id,
             chunk_fp, CAST(n_copies AS BIGINT) AS n_copies,
             CAST(n_words AS BIGINT) AS n_words
      FROM (SELECT chunk_fp, MIN(doc_id * $ChunkPack + cid) AS keep,
                   COUNT(*) AS n_copies, MIN(n_words) AS n_words
            FROM cdc GROUP BY chunk_fp)""",
    "docs_pack" -> s"""
      WITH tok AS (
        SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS n_tokens
        FROM documents),
      ${packTailSql("tok", "n_tokens")}""",
    // Each stage's own oracle embedded verbatim as a CTE (the nested-
    // WITH device dedup_substring_budget proved), then the composite's
    // joins and the pack windows mirrored statement-for-statement.
    "docs_curation_e2e_kmeans" -> s"""
      WITH cur AS (${TextQueries.oracle("docs_curation")}),
      sem AS (${VectorQueries.oracle("dedup_semdedup_kmeans")}),
      dec AS ($deconSql),
      espans AS (${TextQueries.oracle("dedup_substring_spans")}),
      ekept AS (
        SELECT cur.doc_id,
               CAST(cur.n_tokens - COALESCE(sp.dup_tokens, 0) AS BIGINT)
                 AS kept_tokens
        FROM cur
        JOIN dec ON dec.doc_id = cur.doc_id
        LEFT JOIN espans sp ON sp.doc_id = cur.doc_id
        WHERE cur.doc_id NOT IN
          (SELECT vec_id FROM sem WHERE kept = 0)),
      ${packTailSql("ekept", "kept_tokens")}""",
    "dedup_incremental" -> """
      WITH store AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 4 != 0),
      arrivals AS (
        SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 4 = 0)
      SELECT MIN(a.doc_id) AS keep_id, a.fp,
             CAST(COUNT(*) AS BIGINT) AS n_batch_copies
      FROM arrivals a
      WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = a.fp)
      GROUP BY a.fp""",
    "docs_profile" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(c => s"""
        SELECT '$c' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
               CAST(MIN($c) AS VARCHAR) AS min_val,
               CAST(MAX($c) AS VARCHAR) AS max_val,
               CAST(SUM(length(CAST($c AS VARCHAR))) AS BIGINT) AS sum_len
        FROM documents""").mkString(" UNION ALL "),
    // The KMV estimate is a pure function of the md5-derived hash set,
    // so the oracle replays it exactly: distinct hashes, k smallest,
    // (k-1)·domain // kth-min (the q_kmv_distinct device).
    "docs_profile_sketch" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(c => s"""
        SELECT '$c' AS col_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
               (SELECT CAST(COUNT(*) - COUNT($c) AS BIGINT) FROM documents)
                 AS n_nulls,
               (SELECT CAST(CASE WHEN COUNT(*) < $ProfileK THEN COUNT(*)
                       ELSE ${(ProfileK - 1) * ProfileDomain} // MAX(h) END
                  AS BIGINT)
                FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                      FROM (SELECT DISTINCT
                              CAST('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 7)
                                AS BIGINT) AS h
                            FROM documents WHERE $c IS NOT NULL) hs) ranked
                WHERE rn <= $ProfileK) AS est_distinct""")
      .mkString(" UNION ALL "))
}
