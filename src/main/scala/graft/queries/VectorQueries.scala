package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search + vector analytics over `embeddings`
  * (vec_id BIGINT, embedding FLOAT[64] unit-norm, label INT).
  *
  * Cross-engine float determinism: every dot product is an explicit
  * 64-term left-associated sum with each element cast to double before
  * multiplying — Spark's Column DSL `.reduce(_ + _)` and DuckDB's
  * left-associative `+` then perform bit-identical IEEE arithmetic, so
  * scores (and therefore top-k ranking) agree exactly. Hyperplane
  * weights are compile-time Scala integer constants embedded as literals
  * in BOTH the Spark plan and the oracle SQL — no cross-engine RNG or
  * hash dependency.
  *
  * Scale design: brute-force top-k is a broadcast nested loop (queries
  * broadcast, corpus streamed — linear in corpus size, embarrassingly
  * parallel); the LSH variant buckets a 16-bit random-hyperplane
  * signature into 4 bands × 4 bits and joins per band (equi-join on the
  * band value), so candidate generation is a hash-partitioned shuffle
  * join that never goes quadratic as the corpus grows.
  */
object VectorQueries {

  private val Dim = 64

  /** Integer hyperplane weights in [-1000, 1000], LCG-derived at compile
    * time (deterministic, engine-independent).
    */
  private val W: Array[Array[Int]] = Array.tabulate(16, Dim) { (j, i) =>
    val x = (1103515245L * (j * Dim + i + 1) + 12345L) % 2147483648L
    (x % 2001).toInt - 1000
  }

  // ---- Spark-side expressions (native, codegen'd loops) -----------

  private def dot(x: Column, y: Column): Column = VectorFunctions.dotF(x, y)

  /** 16-bit random-hyperplane signature (vector SimHash). */
  private def sig(v: Column): Column = VectorFunctions.hyperplaneSig(v, W)

  /** 4-bit band `b` (0..3) of a signature column. */
  private def band(b: Int, s: Column): Column =
    shiftright(s, b * 4).bitwiseAND(lit(15))

  // ---- Oracle-side SQL generators (same constants, same order) ----

  private def dotSql(x: String, y: String): String =
    (1 to Dim).map(i => s"CAST($x[$i] AS DOUBLE)*CAST($y[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  private def sigSql(v: String): String =
    (0 until 16).map { j =>
      val s = (0 until Dim).map(i =>
        s"${W(j)(i)}.0*CAST($v[${i + 1}] AS DOUBLE)").mkString(" + ")
      s"(CASE WHEN ($s) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bandSql(b: Int, s: String): String =
    s"(($s >> ${b * 4}) & 15)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-3 for 5 query vectors: broadcast the
    // queries, stream the corpus once, rank per query. The exact
    // baseline every ANN variant is judged against.
    "ann_brute_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", dot(col("qe"), col("embedding")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id").as("nn_id"),
          col("rnk").cast("long").as("rnk"),
          round(col("cos"), 6).as("cos_sim"))
    }),

    // LSH-bucketed ANN: candidates = corpus vectors sharing >=1 of 4
    // signature bands with the query, then exact-cosine top-3 within
    // the candidate set. Candidate generation is 4 equi-joins on the
    // band value — the plan that survives a 1e9-vector corpus.
    "ann_lsh_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("sg", sig(col("embedding")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("sg").as("qsg"))
      val cand = (0 until 4).map { b =>
        q.join(e, band(b, col("qsg")) === band(b, col("sg")) &&
          col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nn_id"))
      }.reduce(_ unionAll _).distinct()
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nn_id"))
      cand
        .join(q.select(col("qid"), col("qe")), "qid")
        .join(e.select(col("vec_id").as("nn_id"), col("embedding")), "nn_id")
        .withColumn("cos", dot(col("qe"), col("embedding")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("nn_id"),
          col("rnk").cast("long").as("rnk"),
          round(col("cos"), 6).as("cos_sim"))
    }),

    // Embedding-cosine near-dup: banded-signature candidate pairs
    // (da < db), verified at cosine >= 0.5.
    "dedup_embedding" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("sg", sig(col("embedding")))
      val a = e.select(col("vec_id").as("da"), col("embedding").as("ea"),
        col("sg").as("sa"))
      val bb = e.select(col("vec_id").as("db"), col("embedding").as("eb"),
        col("sg").as("sb"))
      val cand = (0 until 4).map { b =>
        a.join(bb, band(b, col("sa")) === band(b, col("sb")) &&
          col("da") < col("db"))
          .select(col("da"), col("db"))
      }.reduce(_ unionAll _).distinct()
      cand
        .join(a.select(col("da"), col("ea")), "da")
        .join(bb.select(col("db"), col("eb")), "db")
        .withColumn("cos", dot(col("ea"), col("eb")))
        .filter(col("cos") >= 0.5)
        .select(col("da"), col("db"), round(col("cos"), 6).as("cos_sim"))
    }),

    // Per-label centroid in long form (label, pos, c, n): grouped double
    // addition is made order-independent by folding over the SORTED value
    // list on both engines (collect_list+aggregate here, list_sort+
    // list_reduce in DuckDB) — bit-identical IEEE sums without decimal
    // quantization. 64 dims x 10 labels = 640 rows out.
    "vec_label_centroid" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(collect_list(col("v").cast("double")).as("vs"),
          count(lit(1)).as("n"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          (aggregate(array_sort(col("vs")), lit(0.0), (a, x) => a + x) / col("n"))
            .as("c"),
          col("n")))
  )

  val oracle: Map[String, String] = Map(
    "ann_brute_topk" -> s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.qid, e.vec_id, ${dotSql("q.qe", "e.embedding")} AS cos
        FROM q, embeddings e WHERE e.vec_id != q.qid),
      ranked AS (
        SELECT qid, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
        FROM scored)
      SELECT qid, vec_id AS nn_id, CAST(rnk AS BIGINT) AS rnk,
             ROUND(cos, 6) AS cos_sim
      FROM ranked WHERE rnk <= 3""",
    "ann_lsh_topk" -> s"""
      WITH sigs AS (SELECT vec_id, embedding, ${sigSql("embedding")} AS sg FROM embeddings),
      q AS (SELECT vec_id AS qid, embedding AS qe, sg AS qsg FROM sigs WHERE vec_id < 5),
      cand AS (
        SELECT DISTINCT qid, nn_id FROM (
          ${(0 until 4).map(b =>
            s"""SELECT q.qid, e.vec_id AS nn_id FROM q JOIN sigs e
                ON ${bandSql(b, "q.qsg")} = ${bandSql(b, "e.sg")} AND e.vec_id != q.qid""")
            .mkString("\n          UNION ALL\n          ")})),
      scored AS (
        SELECT c.qid, c.nn_id, ${dotSql("q.qe", "e.embedding")} AS cos
        FROM cand c JOIN q ON q.qid = c.qid
        JOIN embeddings e ON e.vec_id = c.nn_id),
      ranked AS (
        SELECT qid, nn_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nn_id) AS rnk
        FROM scored)
      SELECT qid, nn_id, CAST(rnk AS BIGINT) AS rnk, ROUND(cos, 6) AS cos_sim
      FROM ranked WHERE rnk <= 3""",
    "dedup_embedding" -> s"""
      WITH sigs AS (SELECT vec_id, embedding, ${sigSql("embedding")} AS sg FROM embeddings),
      cand AS (
        SELECT DISTINCT da, db FROM (
          ${(0 until 4).map(b =>
            s"""SELECT a.vec_id AS da, b.vec_id AS db FROM sigs a JOIN sigs b
                ON ${bandSql(b, "a.sg")} = ${bandSql(b, "b.sg")} AND a.vec_id < b.vec_id""")
            .mkString("\n          UNION ALL\n          ")})),
      scored AS (
        SELECT c.da, c.db, ${dotSql("a.embedding", "b.embedding")} AS cos
        FROM cand c JOIN embeddings a ON a.vec_id = c.da
        JOIN embeddings b ON b.vec_id = c.db)
      SELECT da, db, ROUND(cos, 6) AS cos_sim FROM scored WHERE cos >= 0.5""",
    "vec_label_centroid" -> """
      SELECT label, CAST(i - 1 AS BIGINT) AS pos,
             list_reduce(list_sort(list(CAST(embedding[i] AS DOUBLE))), (a, x) -> a + x) / COUNT(*) AS c,
             COUNT(*) AS n
      FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
      GROUP BY label, i"""
  )
}
