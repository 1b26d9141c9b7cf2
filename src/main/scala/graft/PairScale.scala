package graft

import org.apache.spark.sql.functions._

/** Dev harness for the pair-density crossover (r11 verdict #6): time
  * the direct Σ df² Jaccard (`dedup_ngram_jaccard`) against its
  * prefix-filtered twin (`dedup_prefix_jaccard`) across FOUR corpus
  * scales — sf0.01, a half-draw of sf0.1, sf0.1, and a 2× fixture —
  * to pin where the AllPairs prefix filter overtakes the direct shape
  * even on this near-uniform corpus.
  *
  * Scale fixtures are derived from the driver corpus, preserving its
  * distribution: the half point drops `doc_id % 2 != 0` (a random
  * half-draw of the same generator); the 2× point unions the corpus
  * with an id-shifted copy of itself — every shingle's df exactly
  * doubles, which is precisely what a same-distribution 2× draw does
  * to the Σ df² candidate volume (×4), at the cost of every doc
  * gaining an exact twin (a worst case for VERIFIED pair volume that
  * both variants pay identically, so the variant RATIO — the quantity
  * under test — is unaffected).
  *
  * {{{ runMain graft.PairScale [sfDir] }}} — min of 3 reps after one
  * untimed warm rep (the Bench r12 contract), one JSON-ish line per
  * (scale, query).
  */
object PairScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-pair-scale")
    val base = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("pairscale").toString
    val halfDir = s"$root/half"
    base.filter(col("doc_id") % 2L === 0L)
      .write.mode("overwrite").parquet(s"$halfDir/documents.parquet")
    val doubleDir = s"$root/double"
    base.unionAll(base.withColumn("doc_id", col("doc_id") + 1000000000L))
      .write.mode("overwrite").parquet(s"$doubleDir/documents.parquet")
    val scales = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "half(0.05)" -> halfDir,
      "sf0.1" -> sfDir,
      "double(0.2)" -> doubleDir)
    try {
      for ((label, dir) <- scales;
           q <- Seq("dedup_ngram_jaccard", "dedup_prefix_jaccard")) {
        BenchSupport.timeRep(spark, dir, q) // warm
        val ts = (1 to 3).map(_ => BenchSupport.timeRep(spark, dir, q))
        println(f"PAIRSCALE scale=$label q=$q min=${ts.min}%.2f " +
          f"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    } finally {
      spark.stop()
      // the derived fixtures are ~3x the sf0.1 corpus per invocation —
      // delete them so iterating on the harness doesn't fill /tmp
      // (code-review r12)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
