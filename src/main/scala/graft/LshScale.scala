package graft

import graft.queries.TextQueries

/** Scaling attribution for `dedup_minhash_lsh` (SCALING_r12 outlier:
  * 5.4× wall-clock under 10× data). The LSH cost model is
  * Σ_buckets n·(n−1)/2 band collisions followed by per-candidate exact
  * verification, so under a same-distribution corpus growth of g the
  * collision volume grows ~g² within each bucket key that recurs —
  * superlinear wall-clock is the MODEL's prediction, not a plan
  * defect, exactly like the Σ df² adjudication of the direct-Jaccard
  * family. This harness measures the prediction: at two scales it
  * counts band-collision rows (pre-distinct), distinct candidate
  * pairs, verified pairs, and the per-band bucket-size stats whose
  * square drives the first number.
  *
  * {{{ runMain graft.LshScale }}} — one line per scale plus a ratio
  * line; counts are exact (the same frames the registered query runs).
  */
object LshScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-lsh-scale")
    try {
      val scales = Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1")
      val rows = scales.map { case (label, dir) =>
        val docs = Tables.documents(spark, dir).count()
        val (coll, cand, ver) = TextQueries.lshCandidateStages(spark, dir)
        val (nc, nd, nv) = (coll.count(), cand.count(), ver.count())
        println(f"LSHSCALE scale=$label docs=$docs collisions=$nc " +
          f"distinct=$nd verified=$nv")
        println(s"LSHSCALE   $label per-band bucket stats:")
        // one row per band (4) — bounded by construction
        TextQueries.lshBucketStats(spark, dir).orderBy("band")
          .show(truncate = false)
        val (collC, candC, verC) = TextQueries.lshCandidateStages(
          spark, dir, cap = Some(TextQueries.LshBucketCap))
        println(f"LSHSCALE scale=$label capped(${TextQueries.LshBucketCap}) " +
          f"collisions=${collC.count()} distinct=${candC.count()} " +
          f"verified=${verC.count()}")
        (docs, nc, nd, nv)
      }
      val (d0, c0, n0, v0) = rows.head
      val (d1, c1, n1, v1) = rows.last
      println(f"LSHSCALE ratios docs=${d1.toDouble / d0}%.1f " +
        f"collisions=${c1.toDouble / c0}%.1f distinct=${n1.toDouble / n0}%.1f " +
        f"verified=${v1.toDouble / v0}%.1f")
    } finally spark.stop()
  }
}
