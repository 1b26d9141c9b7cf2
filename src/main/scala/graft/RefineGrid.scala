package graft

import org.apache.spark.sql.functions.col

import graft.queries.VectorQueries

/** The joint (NProbe, RefineR) recall surface of the IVFADC+R stage
  * (r12 verdict #4): the two serving knobs INTERACT — the refine
  * stage re-ranks only what the ADC scan shortlisted, and the ADC scan
  * sees only the probed cells, so R can never resurrect a neighbor
  * whose cell np did not probe (recall is ceilinged by the
  * exact-within-probed-cells recall at that np). The registered
  * (np, R) point must therefore be picked from the JOINT grid, not
  * from either axis alone — this harness measures recall@3 vs the
  * exact brute-force baseline at sf0.01 for np ∈ {3,4,5} ×
  * R ∈ {10,20,40}, plus each np's ceiling (the exact IVF ranking over
  * the same probed cells). Cost axes differ in kind: np scales the
  * CORPUS-proportional code scan (O(N·np/NCells)), R only the
  * corpus-independent re-rank (R point lookups per query) — so recall
  * bought on the R axis is nearly free at any corpus size while the
  * np axis prices in scan fraction. Measured grid and the registered
  * choice: see the RefineR doc in VectorQueries.
  *
  * {{{ runMain graft.RefineGrid [sfDir] }}} — one GRID line per point.
  */
object RefineGrid {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-refine-grid")
    try {
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("nn_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(VectorQueries.queries("ann_brute_topk")(spark, d))
      def recall(s: Set[(Long, Long)]): Double =
        s.intersect(brute).size.toDouble / brute.size
      for (np <- Seq(3, 4, 5)) {
        // the np ceiling: exact cosine over the same probed cells
        // (ann_ivf_topk's shape at this np — what a perfect shortlist
        // would recover)
        val ceiling = recall(pairs(
          VectorQueries.annStreamIvfTopk(
            Tables.embeddings(spark, d)
              .filter(col("vec_id") < VectorQueries.NQueries)
              .select(col("vec_id").as("qid"), col("embedding").as("qe")),
            spark, d, nprobe = np)))
        val adc = recall(pairs(VectorQueries.ivfpqTopk(spark, d, nprobe = np)))
        println(f"GRID np=$np adc=$adc%.3f ceiling=$ceiling%.3f")
        for (r <- Seq(10, 20, 40)) {
          val rec = recall(pairs(
            VectorQueries.ivfpqRefineTopk(spark, d, nprobe = np, shortlist = r)))
          println(f"GRID np=$np R=$r recall=$rec%.3f")
        }
      }
    } finally spark.stop()
  }
}
