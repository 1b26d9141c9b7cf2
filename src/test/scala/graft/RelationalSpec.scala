package graft

import org.apache.spark.sql.functions._

import graft.queries.{RelationalQueries, TextQueries}

/** Contract specs for the round-3 relational additions — the properties
  * the DuckDB oracle's value-equality can't express: invariants that
  * must hold at ANY scale factor, not just the gated one.
  */
class RelationalSpec extends GraftSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = RelationalQueries.queries(name)(spark, sf)

  test("q18_large_orders: every survivor exceeds the HAVING threshold, ordered by price") {
    val rows = run("q18_large_orders")
      .select(col("o_totalprice"), col("total_qty")).collect()
    assert(rows.nonEmpty, "threshold must not be vacuous at gate scale")
    rows.foreach(r => assert(r.getDouble(1) > 250.0))
    val prices = rows.map(_.getDouble(0))
    assert(prices.sameElements(prices.sortBy(-_)), "top-k order must be by price desc")
  }

  test("q_unpivot: exact long-form geometry — 2 rows per part, both attrs present") {
    val nParts = Tables.part(spark, sf).count()
    val out = run("q_unpivot")
    assert(out.count() === 2 * nParts)
    val attrs = out.select("attr").distinct().collect().map(_.getString(0)).toSet
    assert(attrs === Set("p_size", "p_retailprice"))
  }

  test("q_regex: filter and extraction agree — adj is the matched prefix") {
    val rows = run("q_regex").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("small", "blue").contains(r.getString(2)), r.toString)
      assert(r.getString(1).nonEmpty, "noun must extract for two-word names")
    }
  }

  test("q_set ALL variants: multiplicities follow bag algebra") {
    // EXCEPT ALL multiplicity = max(0, count(all) - count(F)); since only
    // custkeys with a non-F order survive, every multiplicity >= 1 and
    // <= that customer's total order count.
    val totals = Tables.orders(spark, sf)
      .groupBy(col("o_custkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("q_set_except_all").collect().foreach { r =>
      val (k, m) = (r.getLong(0), r.getLong(1))
      assert(m >= 1L && m <= totals(k))
    }
  }

  test("text_lm_score: scores are valid probabilities in ppm and re-run-identical") {
    val out = TextQueries.queries("text_lm_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, ppm, n) =>
      // each per-bigram term is cnt(a,b)/cnt(a) <= 1, so the mean is too
      assert(ppm > 0L && ppm <= 1000000L, s"doc $id score $ppm out of range")
      assert(n >= 1L)
    }
    val again = TextQueries.queries("text_lm_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("docs_quality_quantile: every source keeps at least three quarters, none keeps what it gated") {
    val kept = TextQueries.queries("docs_quality_quantile")(spark, sf)
    val perSource = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("kept"), min(col("quality_ppm")).as("thr"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // totals over the same scorable universe (n_tokens > 0)
    val totals = TextQueries.queries("text_quality")(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, (k, _)) =>
      val n = totals(src)
      assert(4 * k >= 3 * n, s"$src kept $k of $n — below the p25 contract")
    }
    // the gate must actually drop something somewhere (non-vacuous)
    assert(perSource.map(_._2._1).sum < totals.values.sum)
  }
}
