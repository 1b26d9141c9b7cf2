package graft

import org.apache.spark.sql.functions.col

import graft.queries.VectorQueries

/** Decision curve for the drift-gated online IVF epoch rebuild
  * (stream_ann_ivf_online_topk_drift):
  *
  *  - DRIFT r=⟨batch⟩ vs=⟨gen⟩ — the exact fixed-point drift scalar
  *    (max per-cell squared L2 movement, kmDriftFp2) between the
  *    quantizer current at batch r and each earlier generation, over
  *    the gate's own MacQueen trajectory (KmMiniBatch.update driven
  *    batch-for-batch as the stream would).
  *  - SEQ thr=⟨t⟩ — the rebuild sequence (batch ids that re-assign
  *    the corpus) a threshold grid would produce under the engine's
  *    recurrence: rebuild at batch r iff drift(current, last-rebuilt
  *    generation) > t.
  *  - RECALL — recall@3 vs exact brute for the always-rebuild gate
  *    next to the drift-gated gate at the REGISTERED threshold: the
  *    measured staleness cost the knob buys its rebuild savings with.
  *
  * Measured numbers and the registered KmDriftRebuild: see its doc in
  * VectorQueries.
  *
  * {{{ runMain graft.DriftCurve [sfDir] }}}
  */
object DriftCurve {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-drift-curve")
    try {
      val nb = VectorQueries.KmMbBatches
      def batch(r: Int) =
        Tables.embeddings(spark, d).filter(col("vec_id") % nb === r)
      // the gate's own trajectory: generation r = quantizer current at
      // batch r (after r MacQueen steps)
      val st = new VectorQueries.KmMiniBatch(spark, d)
      val gens = Seq.newBuilder[org.apache.spark.sql.DataFrame]
      gens += st.centroidTable.localCheckpoint()
      for (r <- 0 until nb) {
        st.update(batch(r), r)
        gens += st.centroidTable
      }
      val g = gens.result()
      val drift = Array.tabulate(nb, nb) { (r, gg) =>
        if (gg < r) VectorQueries.kmDriftFp2(g(r), g(gg)) else 0L
      }
      for (r <- 1 until nb; gg <- 0 until r)
        println(s"DRIFT r=$r vs=$gg d2=${drift(r)(gg)}")
      // rebuild sequences over a threshold grid (the engine recurrence)
      val observed = (1 until nb).flatMap(r => (0 until r).map(drift(r)(_)))
        .distinct.sorted
      val grid = (observed.map(_ - 1) ++ observed ++
        Seq(0L, Long.MaxValue) ++ Seq(VectorQueries.KmDriftRebuild))
        .distinct.sorted
      for (t <- grid) {
        var last = 0
        val seq = Seq.newBuilder[Int]
        seq += 0
        for (r <- 1 until nb) if (drift(r)(last) > t) { seq += r; last = r }
        println(s"SEQ thr=$t rebuilds=${seq.result().mkString(",")}")
      }
      // staleness cost at the registered threshold
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("nn_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(VectorQueries.queries("ann_brute_topk")(spark, d))
      def served(step: (VectorQueries.KmMiniBatch,
                        org.apache.spark.sql.DataFrame, Long) => Unit) = {
        val s2 = new VectorQueries.KmMiniBatch(spark, d)
        for (r <- 0 until nb) step(s2, batch(r), r.toLong)
        (pairs(s2.servedTopkResult()), s2.rebuildLog)
      }
      val (full, _) = served((s2, b, id) => s2.serveIvfAndUpdate(b, id))
      val (stale, log) = served((s2, b, id) => s2.serveIvfDriftAndUpdate(b, id))
      def recall(s: Set[(Long, Long)]): Double =
        s.intersect(brute).size.toDouble / brute.size
      println(f"RECALL thr=${VectorQueries.KmDriftRebuild} " +
        f"full=${recall(full)}%.4f drift=${recall(stale)}%.4f " +
        s"rebuilds=${log.mkString(",")}")
      // the per-cell incremental gate: moved-cell schedule + recall
      val si = new VectorQueries.KmMiniBatch(spark, d)
      for (r <- 0 until nb) si.serveIvfIncrAndUpdate(batch(r), r.toLong)
      val movedCounts = si.movedCells.map(_.count())
      val incrRecall = recall(pairs(si.servedTopkResult()))
      // moved-member fraction per batch: the rows the incremental step
      // actually re-assigned over the corpus size — the direct
      // measurement of "re-assignment work ∝ moved cells' members"
      // (batch 0 is the initial build, fraction 1 by construction)
      val corpusN = Tables.embeddings(spark, d).count().toDouble
      val migFrac = si.migratedMembers.map(_.count() / corpusN)
      println(f"INCR thr=${VectorQueries.KmDriftRebuild} " +
        f"recall=$incrRecall%.4f moved=${movedCounts.mkString(",")} " +
        s"migrated_frac=${migFrac.map(f => f"$f%.4f").mkString(",")}")
      // THE COMPOSED GATE's threshold sensitivity (r16 verdict Next
      // #7): the persisted-refresh protocol end-to-end (ingest →
      // drift decision → generation rewrite → pruned serving) at a
      // two-point sweep around the registered KmDriftRebuild (0.125
      // and 0.5 L2 — thr/4 and thr·4 in the squared fixed-point
      // metric), showing the rebuild-count/recall trade the constant
      // buys. Recall here is vs the exact brute top-3 over the
      // ARRIVED corpus per batch — the only corpus the store can hold.
      val arrBrute = (0 until nb)
        .map(r => pairs(VectorQueries.arrivedBruteTopk(spark, d, r, nb)))
        .reduce(_ union _)
      val base = VectorQueries.KmDriftRebuild
      for (thr <- Seq(base / 4, base, base * 4)) {
        val sp = new VectorQueries.KmMiniBatch(spark, d)
        for (r <- 0 until nb)
          sp.serveIvfPersistedAndUpdate(batch(r), r.toLong, thr)
        val rr = pairs(sp.servedTopkResult())
          .intersect(arrBrute).size.toDouble / arrBrute.size
        println(f"REFRESH thr=$thr recall=$rr%.4f " +
          s"rebuilds=${sp.rebuildLog.mkString(",")}")
      }
    } finally spark.stop()
  }
}
