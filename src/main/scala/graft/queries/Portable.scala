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

  /** The HIGH-BIT bucket device in [0, mod): LCG step, slice off the
    * weak low 16 bits, modulo. ONE definition (with its SQL twin
    * below) for every deterministic sampler — CurationQueries'
    * bucket100/splits and the k-means training sample — so the
    * parity-critical bit slice cannot drift between consumers.
    * `.divide` (double division) then cast-to-long is exact here:
    * the LCG value is < 2^31, a power-of-two divide of it is an
    * integer-representable double, and the cast truncates to the
    * same floor DuckDB's `//` takes on non-negative values.
    */
  def bucket(id: Column, mod: Long): Column =
    lcg(id).divide(65536L).cast("long") % mod

  /** [[bucket]] with a COMPUTED modulus (a Column — e.g. a corpus-
    * size-derived one-row broadcast): same bit slice, same arithmetic,
    * so a data-dependent sampling rate stays engine-portable. Used by
    * the size-targeted k-means training sample.
    */
  def bucket(id: Column, mod: Column): Column =
    lcg(id).divide(65536L).cast("long") % mod

  /** Oracle twin of [[bucket]]. */
  def bucketSql(c: String, mod: Long): String =
    s"((${lcgSql(c)} // 65536) % $mod)"

  /** Oracle twin of the Column-modulus [[bucket]]: `modSql` is any SQL
    * scalar expression (typically a scalar subquery deriving the
    * modulus from the corpus size).
    */
  def bucketSqlExpr(c: String, modSql: String): String =
    s"((${lcgSql(c)} // 65536) % ($modSql))"
}
