package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.Aggregators

/** Specs for the extension surfaces: SQL-registered native functions
  * (SparkSessionExtensions), the typed Aggregator, and the
  * stream-stream join showcase (SURVEY.md §2.6 joins row).
  */
class ExtensionsSpec extends GraftSpec {
  import spark.implicits._

  test("GraftExtensions registers float_dot and byte_stats for SQL") {
    // getOrCreate reuses the shared test session (ignoring
    // withExtensions), so install the same function descriptions into
    // its live registry — identical builders to the extension path.
    val s2 = spark
    GraftExtensions.install(s2)
    try {
      val d = s2.sql(
        "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT))," +
          " array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(d === 1.5 * 4 + 2 * 0.5)
      val st = s2.sql("SELECT byte_stats(CAST('ab' AS BINARY)) AS st")
        .select("st.*").head()
      assert((st.getLong(0), st.getLong(1), st.getInt(2), st.getInt(3)) ===
        ((2L, 195L, 97, 98)))
      // ppm_phash_bands: non-image payload → NULL on the SQL surface
      // (the full hash math is pinned in MediaSpec)
      assert(s2.sql("SELECT ppm_phash_bands(CAST('nope' AS BINARY)) AS b")
        .head().isNullAt(0))
    } finally ()
  }

  test("cdc_chunks SQL function equals cdcChunkRows exactly") {
    // the SQL surface of the content-defined chunker: posexploding
    // cdc_chunks(text) must reproduce the row-generator's output
    // row-for-row (one shared definition of the boundary rule — this
    // spec pins that the composition really is the same function)
    GraftExtensions.install(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("cdc_sql_docs")
    val viaSql = spark.sql("""
        SELECT doc_id, CAST(p AS BIGINT) AS cid,
               c.n_words AS n_words, c.chunk_fp AS chunk_fp
        FROM cdc_sql_docs
        LATERAL VIEW posexplode(cdc_chunks(text)) t AS p, c""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val viaRows = graft.queries.CurationQueries.cdcChunkRows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(viaRows.nonEmpty)
    assert(viaSql === viaRows)
    // empty/whitespace-only text yields an empty array (the scalar
    // form's natural semantics; the row generator filters such docs)
    assert(spark.sql("SELECT size(cdc_chunks('')) AS n").head().getInt(0) === 0)
    assert(spark.sql("SELECT size(cdc_chunks('   ')) AS n").head().getInt(0) === 0)
    // wrong arity fails at analysis, like the other registered forms
    intercept[Exception] {
      spark.sql("SELECT cdc_chunks('a', 'b')").head()
    }
  }

  test("Dataset.observe surfaces job metrics without a second pass") {
    // the ops-monitoring surface (the reference's per-machine logs,
    // SURVEY §5): named aggregates ride along with the job — metrics
    // cost zero extra scans and arrive with the action's completion
    val obs = new org.apache.spark.sql.Observation("lineitem_stats")
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .filter(col("l_quantity") > 0)
    val n = df.count()
    val row = obs.get
    assert(row("n_rows") === 6000L)
    assert(row("sum_qty").asInstanceOf[Double] > 0.0)
    assert(n <= 6000L)
  }

  test("LongStatsAggregator merges partial buffers correctly") {
    val df = Seq(("a", 5L), ("a", 1L), ("b", 7L), ("a", 3L))
      .toDF("k", "q").repartition(3)
    val out = df.groupBy("k").agg(Aggregators.longStats(col("q")).as("st"))
      .select(col("k"), col("st.n_q"), col("st.sum_q"),
        col("st.min_q"), col("st.max_q"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((3L, 9L, 1L, 5L)))
    assert(out("b") === ((1L, 7L, 7L, 7L)))
  }

  test("TopKAggregator equals window row_number top-k on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500)(i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toDouble, i.toLong))
    val df = rows.toDF("g", "score", "id") // duplicate scores -> tie-break matters
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.Aggregators.topK(3)(col("score"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t._1").as("score"), col("t._2").as("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("g", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("MinKDistinctAggregator equals sorted-distinct-take-k across partitions") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(2000)(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(300).toLong)) // heavy duplicates
    val df = rows.toDF("g", "v").repartition(7)
    val viaAgg = df.groupBy("g")
      .agg(Aggregators.minKDistinct(16)(col("v")).as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(16)).toMap
    assert(viaAgg.keySet === expected.keySet)
    viaAgg.foreach { case (g, mins) =>
      assert(mins === expected(g), s"group $g")
    }
  }

  test("KMV estimate lands within theoretical error of the exact distinct count") {
    // k=64 -> ~1/sqrt(64) = 12.5% expected relative error; assert 3x slack
    val d = "/root/testdata/sf0.01"
    graft.queries.RelationalQueries.queries("q_kmv_distinct")(spark, d)
      .collect().foreach { r =>
        val (est, exact) = (r.getLong(1), r.getLong(2))
        assert(exact >= 64, "gate corpus must exercise the estimation branch")
        assert(math.abs(est - exact).toDouble / exact < 0.375,
          s"${r.getString(0)}: est $est vs exact $exact")
      }
  }

  test("SortedIntersectCount equals array_intersect size on random sets") {
    val rnd = new scala.util.Random(11)
    val cases = Seq.tabulate(50) { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40)).distinct.sorted
      (a, b)
    }
    val df = cases.toDF("a", "b")
      .withColumn("merge",
        graft.functions.ArrayFunctions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("merge") =!= col("ref")).count() === 0)
  }

  test("SortedIntersectCount handles LONG arrays incl. negatives (hash ids)") {
    // Regression: shingle ids are xxhash64 longs (often negative); the
    // kernel must read 8-byte elements — getInt over a long array reads
    // garbage and silently undercounts.
    val rnd = new scala.util.Random(13)
    val cases = Seq.tabulate(50) { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct.sorted
      val b = (Seq.fill(rnd.nextInt(30))(rnd.nextLong()) ++ a.take(5)).distinct.sorted
      (a, b)
    }
    val df = cases.toDF("a", "b")
      .withColumn("merge",
        graft.functions.ArrayFunctions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("merge") =!= col("ref")).count() === 0)
    // shared prefix guarantees non-trivial intersections were exercised
    assert(df.filter(col("ref") >= 3).count() > 0)
  }

  test("stream-stream join with watermarks matches the batch join") {
    implicit val sql = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val impressions = Seq(("ad1", ts(0)), ("ad2", ts(1)), ("ad3", ts(2)))
    val clicks = Seq(("ad1", ts(3)), ("ad2", ts(30)), ("ad4", ts(4)))

    val msI = MemoryStream[(String, java.sql.Timestamp)]
    val msC = MemoryStream[(String, java.sql.Timestamp)]
    val i = msI.toDF().toDF("ad", "its").withWatermark("its", "10 minutes")
    val c = msC.toDF().toDF("cad", "cts").withWatermark("cts", "10 minutes")
    val joined = i.join(c,
      col("ad") === col("cad") &&
        col("cts") >= col("its") &&
        col("cts") < col("its") + expr("INTERVAL 10 MINUTES"))
      .select(col("ad"), col("its"), col("cts"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join").start()
    try {
      msI.addData(impressions: _*)
      msC.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("ss_join").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      // ad1 clicked within 10 min; ad2's click is 29 min late; ad4 never shown
      assert(got === Set(("ad1", ts(0), ts(3))))
    } finally q.stop()
  }
}
