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

  /** Bounded-heap top-k per group: keeps the k largest (score, id) pairs
    * in the aggregation buffer, so the shuffle carries at most k rows
    * per (partition, group) — the scale answer to top-k-per-group that
    * a window `row_number` (full sort, full shuffle) cannot give.
    * Deterministic under ties via the id tie-break.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      xs.sorted(ord).take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ x)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `topK(3)($"score", $"id")` → array of the 3 largest (score, id). */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k)).apply(score, id)

  /** Bounded-state K-minimum-values buffer: the k smallest DISTINCT
    * longs per group. The KMV sketch's state — never more than k
    * values in the buffer regardless of group size, partial-
    * aggregating and exactly mergeable (union → distinct → take k),
    * unlike the window row_number formulation, whose shuffle carries
    * every distinct value. Per-row trim is O(k log k); fine for gate
    * scale, and still linear in input overall.
    */
  class MinKDistinctAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    override def zero: Seq[Long] = Seq.empty
    override def reduce(b: Seq[Long], x: Long): Seq[Long] =
      if (b.length == k && x >= b.last) b else trim(b :+ x)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `minKDistinct(64)($"h")` → sorted array of the group's 64 smallest
    * distinct values.
    */
  def minKDistinct(k: Int)(c: Column): Column =
    udaf(new MinKDistinctAggregator(k)).apply(c)
}
