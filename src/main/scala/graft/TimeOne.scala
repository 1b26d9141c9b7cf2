package graft
/** Dev harness: time ONE registered query N times (median-friendly,
  * cache-cleared between reps) — for iterating on a single plan without
  * the noise of a full Bench run.
  * {{{ runMain graft.TimeOne <query> <sfDir> [reps] }}}
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("graft-timeone")
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    println(f"TIMEONE $name ${times.map(t => f"$t%.2f").mkString(" ")} median=${times.sorted.apply(reps / 2)}%.2f")
    spark.stop()
  }
}
