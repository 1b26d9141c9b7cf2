package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftSpec, Tables}
import graft.queries.TimeWindowQueries._

/** The count-min sketch's published contract, exercised across the
  * geometry knob (depth, width): estimates never undercount (the
  * one-sided CMS guarantee — every counter a key probes contains its
  * full count plus collisions, and min-over-depths can't dip below the
  * true count), and error shrinks as width grows (ε ~ e/width). The
  * bench default 4×2048 sits between a deliberately-collision-heavy
  * 2×64 and an effectively-exact 4×2²⁰. The sf0.01 corpus has 150
  * distinct users (ids 0..149), so the narrow geometry MUST be under
  * 150 buckets to collide at all — and with ODD multipliers a mod a
  * power-of-two width, small keys collide in the SAME sets at every
  * depth (u ≡ u′ mod width; the mod-p wrap only decorrelates depths
  * once keys exceed ~p/a), so the narrow sketch genuinely
  * overestimates instead of being rescued by min-over-depths.
  */
class SketchSpec extends GraftSpec {

  private val d = "/root/testdata/sf0.01"
  private lazy val ev = Tables.events(spark, d).select(col("user_id"))
  private lazy val exact: Map[Long, Long] =
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def estimates(depth: Int, width: Long): Map[Long, Long] =
    cmsEstimate(cmsCounters(ev, depth, width), ev, depth, width,
      threshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("CMS never undercounts, at three geometries") {
    for ((depth, width) <- Seq((2, 64L), (CmsDepth, CmsWidth), (4, 1L << 20))) {
      val est = estimates(depth, width)
      assert(est.keySet === exact.keySet, s"geometry ($depth, $width)")
      val under = exact.collect {
        case (u, n) if est(u) < n => s"user $u: est ${est(u)} < true $n"
      }
      assert(under.isEmpty,
        s"CMS undercounted at ($depth, $width): ${under.take(3).mkString("; ")}")
    }
  }

  test("CMS error shrinks with width; the wide geometry is exact here") {
    def totalErr(depth: Int, width: Long): Long =
      estimates(depth, width).map { case (u, e) => e - exact(u) }.sum
    val narrow = totalErr(2, 64L)
    val default = totalErr(CmsDepth, CmsWidth)
    val wide = totalErr(4, 1L << 20)
    info(s"total overestimation: 2x64=$narrow default=$default wide=$wide")
    assert(narrow > default,
      "the collision-heavy geometry should overestimate more than the default")
    assert(wide === 0L,
      "at width 2^20 (>> distinct users) min-over-4-depths should be exact")
  }

  test("depth beyond the provided hash rows is rejected") {
    val e = intercept[IllegalArgumentException] { cmsCounters(ev, 9, 64L) }
    assert(e.getMessage.contains("cms depth"))
  }
}
