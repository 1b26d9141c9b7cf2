package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (the UDAF surface, SURVEY.md §2.6).
  *
  * The reference's only aggregation hook is the 1-line COUNT protocol
  * (rainstorm/server.go:344-355); `Aggregator[IN, BUF, OUT]` is its
  * full-strength replacement: partial-aggregating (map-side combine →
  * the shuffle carries one buffer per (partition, key)), codegen-
  * compatible via the udaf() bridge, and exactly mergeable.
  *
  * Integer-domain arithmetic keeps results bit-portable to the oracle.
  */
object Aggregators {

  case class LongStatsBuf(n: Long, sum: Long, mn: Long, mx: Long)
  case class LongStats(n_q: Long, sum_q: Long, min_q: Long, max_q: Long)

  /** Exact (count, sum, min, max) over a long column in one buffer. */
  object LongStatsAggregator extends Aggregator[Long, LongStatsBuf, LongStats] {
    override def zero: LongStatsBuf =
      LongStatsBuf(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: LongStatsBuf, x: Long): LongStatsBuf =
      LongStatsBuf(b.n + 1, b.sum + x, math.min(b.mn, x), math.max(b.mx, x))
    override def merge(a: LongStatsBuf, b: LongStatsBuf): LongStatsBuf =
      LongStatsBuf(a.n + b.n, a.sum + b.sum,
        math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    override def finish(b: LongStatsBuf): LongStats =
      LongStats(b.n, b.sum, b.mn, b.mx)
    override def bufferEncoder: Encoder[LongStatsBuf] = Encoders.product
    override def outputEncoder: Encoder[LongStats] = Encoders.product
  }

  /** Column form: `longStats($"q")` yields a struct(n_q, sum_q, min_q, max_q). */
  def longStats(c: Column): Column = udaf(LongStatsAggregator).apply(c)
}
