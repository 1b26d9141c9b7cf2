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
  private val Reps = 3

  // The rep contract (warmup, noop-write timing, median-of-reps with
  // the host-noise rationale) lives in BenchSupport, shared with
  // ClusterBench and ScalingCheck. The full per-rep times are
  // persisted in bench_out.json under "reps" so a contended run is
  // visible IN the artifact (reps that disagree by multiples = host
  // noise, not a regression) instead of masquerading as one.
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    BenchSupport.warmTables(spark, sfDir)
    // Deterministic order + cache cleanup per query.
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val times = (1 to Reps).map(_ => BenchSupport.timeRep(spark, sfDir, name))
      val good = times.filter(_ >= 0)
      (name, if (good.nonEmpty) BenchSupport.median(good) else -1.0, times)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The driver captures one line; the persisted artifact additionally
    // carries every rep so the evidence self-diagnoses host noise (and
    // survives log-tail truncation of the per-query map).
    val reps = results.map { case (k, _, ts) =>
      s"\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val fileJson = json.dropRight(1) + s""","reps":$reps}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (fileJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // benchmark output must never fail the run
    spark.stop()
  }
}
