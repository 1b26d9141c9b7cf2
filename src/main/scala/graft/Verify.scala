package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional extra args: query names to dump (subset for fast iteration;
    // the driver always passes exactly two args and gets the full run).
    val only = args.drop(2).toSet
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // queries may cache intermediates (shingle sets, LSH assignment
        // tables); don't let one query's cache tax the rest of the run
        spark.catalog.clearCache()
      }
    dumpOracleSql(SparkEntry.oracleSql, s"$outDir/oracle_sql.json")
    spark.stop()
  }

  /** Write an oracle-SQL map as the driver's oracle_sql.json (shared
    * with ClusterCheck's slice dump).
    *
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def dumpOracleSql(oracle: Map[String, String], path: String): Unit = {
    val json = oracle.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(path), json)
  }

  /** The one JSON string escaper (ClusterCheck's status line shares it
    * — a second copy would drift on the next escape fix).
    */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
