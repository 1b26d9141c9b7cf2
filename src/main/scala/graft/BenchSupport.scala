package graft

import org.apache.spark.sql.SparkSession

/** The rep contract shared by every timing main (Bench, ClusterBench,
  * ScalingCheck): one definition of warmup, per-rep noop-write timing,
  * and the median — so the contract cannot drift between harnesses
  * (code-review finding: three copy-pasted implementations described
  * as the "same rep contract").
  */
private[graft] object BenchSupport {

  /** Median of the successful reps: this host shows sustained external
    * contention (unchanged queries measured 1s and 9s across runs), and
    * min-of-2 demonstrably did not absorb a multi-rep spike — the
    * median tolerates one contaminated rep out of three.
    */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2) // odd-length reps; upper middle for even
  }

  /** Touch every table once so the first timed query doesn't absorb
    * file-listing + JIT + codegen-compiler startup.
    */
  def warmTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }

  /** One timed rep: materialize through the `noop` writer (count()
    * would let Catalyst prune unreferenced columns and time the scan,
    * not the compute), clear the cache after, return -1.0 on failure
    * (the elapsed time of a broken query would otherwise report it as
    * very fast).
    */
  def timeRep(spark: SparkSession, sfDir: String, name: String): Double = {
    val t0 = System.nanoTime()
    val ok =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    if (ok) dt else -1.0
  }
}
