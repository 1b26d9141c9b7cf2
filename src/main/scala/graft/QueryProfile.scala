package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev harness: run ONE registered query under a stage/job listener and
  * print where the wall-clock went — per-job durations (with the job
  * count itself: driver-orchestrated composites pay a fixed per-job
  * overhead that no plan change shows) and the slowest stages with
  * their shuffle read/write volumes. Guide §1 (empirical loop) — this
  * is the local-mode stand-in for the Spark UI's stage page, which is
  * disabled in the harness sessions (spark.ui.enabled=false).
  *
  * {{{ runMain graft.QueryProfile <query> <sfDir> [reps] }}}
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local("graft-profile")
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    val jobStart = mutable.Map[Int, Long]()
    val jobs = mutable.ArrayBuffer[(Int, Long)]() // (jobId, ms)
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Int)]()
    var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) jobStart(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (record) jobStart.remove(e.jobId).foreach(t0 =>
          jobs += ((e.jobId, e.time - t0)))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          val m = si.taskMetrics
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(90),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.numTasks))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      jobs.clear(); stages.clear(); jobStart.clear()
      record = rep == reps // warm reps unrecorded
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"PROFILE rep=$rep $name wall=$dt%.2fs")
    }
    // listener events are posted async; give the bus a moment
    Thread.sleep(1000)
    val jobTotal = jobs.map(_._2).sum / 1e3
    println(f"PROFILE jobs=${jobs.size} sum_job_time=$jobTotal%.2fs " +
      f"(wall minus this = driver-side planning/orchestration)")
    println("PROFILE slowest jobs:")
    jobs.sortBy(-_._2).take(12).foreach { case (id, ms) =>
      println(f"  job $id%4d ${ms / 1e3}%7.3fs")
    }
    println("PROFILE slowest stages (dur, shufRead, shufWrite, tasks):")
    stages.sortBy(-_._3).take(20).foreach { case (id, nm, ms, sr, sw, nt) =>
      println(f"  stage $id%4d ${ms / 1e3}%7.3fs sr=${sr / 1024}%8dKB " +
        f"sw=${sw / 1024}%8dKB tasks=$nt%3d  $nm")
    }
    spark.stop()
  }
}
