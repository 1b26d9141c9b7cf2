package graft

/** Dev harness for the batched-BPE cost curve: times the exact trainer
  * and the batched trainer at equal merge budgets across (rounds, m)
  * splits. {{{ runMain graft.BpeCurve [sfDir] }}} — numbers land in
  * bpeTrainBatchedAt's doc.
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-bpe-curve")
    BenchSupport.warmTables(spark, sfDir)
    def time(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"BPECURVE $label min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    import graft.queries.TextQueries._
    time("exact_r16", () => bpeTrainAt(spark, sfDir, 16))
    time("batched_r4_m4", () => bpeTrainBatchedAt(spark, sfDir, 4, 4))
    time("batched_r2_m8", () => bpeTrainBatchedAt(spark, sfDir, 2, 8))
    time("batched_r1_m16", () => bpeTrainBatchedAt(spark, sfDir, 1, 16))
    time("batched_r1_m32", () => bpeTrainBatchedAt(spark, sfDir, 1, 32))
    time("batched_r2_m32", () => bpeTrainBatchedAt(spark, sfDir, 2, 32))
    // the 30k-path claim measured AT the claimed admission rate, not
    // extrapolated: m=256 over deep round counts — per-round cost and
    // its flatness as rounds grow are the two numbers the claim rests on
    time("batched_r8_m256", () => bpeTrainBatchedAt(spark, sfDir, 8, 256))
    time("batched_r32_m256", () => bpeTrainBatchedAt(spark, sfDir, 32, 256))
    spark.stop()
  }
}
