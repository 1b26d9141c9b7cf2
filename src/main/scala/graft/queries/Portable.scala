package graft.queries

import org.apache.spark.sql.Column

/** The ONE definition of the portable integer LCG used everywhere a
  * query needs a deterministic pseudo-random value that BOTH engines
  * compute bit-identically (sampling, splits, projection signs,
  * hyperplane weights): x -> ((x % 2^31) * 1103515245 + 12345) % 2^31
  * (the classic POSIX rand constants). All intermediates stay positive
  * and below 2^62, so BIGINT `%` and floor-division agree across
  * Spark and the oracle. Spark's own random()/xxhash64 are NOT
  * reproducible in DuckDB — this is the portability device.
  *
  * Consumers slice the HIGH bits (div 2^16) — an odd-multiplier LCG's
  * low bit alternates.
  */
private[queries] object Portable {
  val LcgA = 1103515245L
  val LcgB = 12345L
  val LcgM = 2147483648L // 2^31

  /** Spark-side LCG step over a non-negative integer column. */
  def lcg(id: Column): Column = ((id % LcgM) * LcgA + LcgB) % LcgM

  /** Compile-time LCG step (hyperplane weights, projection signs). */
  def lcg(x: Long): Long = ((x % LcgM) * LcgA + LcgB) % LcgM

  /** The same step as oracle SQL over a column expression. */
  def lcgSql(c: String): String = s"((($c % $LcgM) * $LcgA + $LcgB) % $LcgM)"
}
