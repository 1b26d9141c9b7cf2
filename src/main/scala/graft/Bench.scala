package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: times every SparkEntry query at the given SF and
  * prints ONE JSON line. Queries are materialized through the `noop`
  * datasource writer — every column of every row is computed and handed
  * to the sink — because `count()` lets Catalyst prune unreferenced
  * columns and would time the scan, not the compute, for projection
  * queries. A query that throws is recorded as -1 in `queries` and named
  * in `failed` (its elapsed time would otherwise report a broken query
  * as very fast).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // Warmup: touch every table once so the first timed query doesn't
    // absorb file-listing + JIT + codegen-compiler startup.
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    // Deterministic order + cache cleanup per query; each query is run
    // TWICE and the min reported — this host shows transient external
    // contention spikes (unchanged queries measured 0.5s and 19s in
    // back-to-back runs), and min-of-2 absorbs a spike landing on
    // either attempt.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }
      (name, if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // Also persist the line: the round driver captures only the log
    // TAIL, which has truncated the per-query times of the
    // alphabetically-first (heaviest) entries before — the file keeps
    // the full evidence regardless of log truncation.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // benchmark output must never fail the run
    spark.stop()
  }
}
