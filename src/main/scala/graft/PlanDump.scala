package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a set of registered queries to files —
  * the optimization rounds' before/after plan evidence (plans/r18/...).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [names...]
  * With no names, dumps every registered query. Each query's plan lands
  * in <outDir>/<name><suffix>.txt. Streaming gates execute their drain
  * when the query function is invoked; the dumped plan is the plan of
  * the RESULT frame they return (for gates that's the memory/file sink
  * read-back — the useful before/after evidence for gates is the store
  * scan shape, covered by the batch faces and PartitioningSpec).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val only = args.drop(3).toSet
    val spark = GraftSession.local("graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
