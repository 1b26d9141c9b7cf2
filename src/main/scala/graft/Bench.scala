package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query at the given SF and
  * prints ONE JSON line. Queries are materialized through the `noop`
  * datasource writer — every column of every row is computed and handed
  * to the sink — because `count()` lets Catalyst prune unreferenced
  * columns and would time the scan, not the compute, for projection
  * queries. A query that throws is recorded as -1 in `queries` and named
  * in `failed` (its elapsed time would otherwise report a broken query
  * as very fast).
  *
  * == Noise-robust protocol (round 11) ==
  * This host shows sustained external contention: identical plans
  * measured 118.5 s (r9) → 249.5 s (r10 closing) with ZERO code
  * changes, and within-run reps disagree by 3–4×. Three devices make
  * the headline robust to that, so a future reader can separate host
  * noise from plan regressions mechanically instead of by adjudication:
  *
  *  1. MIN-OF-N per query (N = 3 cache-cleared reps, preceded by ONE
  *     untimed warm rep — round 12) is the plan-comparison number.
  *     External contention is one-sided — it can only inflate a rep,
  *     never deflate it — so the min is the best available estimate
  *     of the uncontended cost. The warm rep absorbs per-query
  *     compilation transients: r12 traced the protocol's first real
  *     flag (text_winnow 1.8–2.3× vs anchor) to a 2–3-rep codegen/JIT
  *     warm-up (cold reps 3.62, 1.43 s settling to a 0.95 s steady
  *     state ≈ the anchor) — min-of-3 from cold can fail to escape
  *     the transient, reporting compilation, not the plan. Steady
  *     state is the honest number at scale: a 100 TB job pays codegen
  *     once for hours of execution. The median is
  *     still recorded (`queries_median`) for continuity with r9/r10.
  *  2. A CALIBRATION PROBE — a fixed pure-CPU computation with no IO
  *     and no SF dependence (`sum(xxhash64(id))` over a 20M range) —
  *     runs before the first query and after every query. Its trace is
  *     persisted; contended stretches of the run show up IN the
  *     artifact as probe spikes aligned with inflated query times.
  *  3. PROBE-NORMALIZED values: each query's min is scaled by
  *     (run's min probe / median of the query's two adjacent probes).
  *     The min probe is the run's quietest moment — its closest
  *     approach to the uncontended host — so normalized numbers are
  *     comparable across runs even when whole runs differ in load.
  *
  * `BENCH_BASELINE.json` (a committed copy of a trusted quiet-host
  * bench_out.json — the canonical anchor, reset round 11) is read if
  * present and each query is compared against its baseline on BOTH
  * channels — the normalized value (`queries_norm`) and the raw min
  * (`queries`); a query is named in `vs_baseline` only when BOTH
  * ratios exceed 1.5× (round 12). One channel alone is not evidence:
  * raw mins inflate under run-wide contention (exactly what
  * normalization corrects), while the normalization factor itself is
  * noisy wherever a run's ADJACENT probes spiked — the r12 run showed
  * 6 untouched plans at 1.5–1.8× normalized whose raw mins moved only
  * 1.1–1.3×, all because the anchor's local probes were inflated and
  * overcorrected those entries downward. A real plan regression moves
  * both channels together.
  *
  * == Mechanical anchor promotion (round 12) ==
  * The anchor is replaceable ONLY by a run whose probe trace
  * DOMINATES the incumbent's — min AND median AND max all ≤ (ties
  * promote). Under the one-sided-noise model a dominating trace means
  * the candidate observed a quieter host at every summary point, so
  * promotion can only tighten the anchor — the rule a judgment call
  * ("quietest of four runs", commit 2adae72) could not guarantee.
  * Each run emits its own comparison as `anchor_candidate` in
  * bench_out.json; `tools/promote_anchor.py` enforces the replacement
  * and appends every attempt (accepted or rejected, with both probe
  * summaries) to the anchor's `promotion_log`.
  *
  * COVERAGE vs REPLACEMENT: newly registered queries are absent from
  * the anchor and so have NO regression guard until some run
  * dominates — which may never happen if the anchor caught an
  * unusually quiet window. `promote_anchor.py --augment` closes that
  * hole without weakening the rule: it ADDS per-query entries the
  * anchor lacks (existing entries, probe stats, and totals are
  * untouchable) and logs the source run's probe stats per
  * augmentation. Augmented raw mins are one-sided-conservative (a
  * contended source inflates them → under-flagging), which the
  * stored normalized channel corrects — the dual-channel rule needs
  * BOTH to exceed 1.5×.
  *
  * Anchor-protocol provenance: RETIRED r12 — the committed anchor is
  * a warm-protocol run (the mid-r12 dominating promotion replaced the
  * last cold-protocol anchor; see promotion_log), so candidates and
  * the anchor now measure the same steady state. Recorded because the
  * cold-era caveat (warm-vs-cold comparison can only UNDER-flag)
  * governed diffs up to that promotion.
  */
object Bench {
  private val Reps = 3
  /** Probe ratios within this band of 1.0 are host noise, beyond it a
    * flagged regression candidate.
    */
  private val RegressionRatio = 1.5

  /** One calibration-probe sample: pure CPU (hash + sum over a range —
    * codegen'd, no IO, no shuffle beyond the final 1-row agg), ~0.2 s
    * on this host uncontended. Returns seconds.
    */
  private def probeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // summands bounded to 2^20 so the 20M-row ANSI sum cannot overflow
    spark.range(0, 20000000L, 1, 8)
      .select(sum(pmod(xxhash64(col("id")), lit(1048576L))))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Minimal extractor for a named {"name":1.23,...} object in
    * BENCH_BASELINE.json via regex — no JSON lib on the classpath,
    * and the file is machine-written by this object, so the shape is
    * fixed. `key` is the object's literal key (`queries_norm` /
    * `queries`).
    */
  private[graft] def readBaselineKey(path: String,
                                     key: String): Map[String, Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        "UTF-8")
      (""""""" + key + """"\s*:\s*\{([^}]*)\}""").r.findFirstMatchIn(txt) match {
        case Some(m) =>
          """"([^"]+)"\s*:\s*(-?[0-9.eE+-]+)""".r.findAllMatchIn(m.group(1))
            // per-entry guard: one hand-mangled numeric (e.g. "1.2.3"
            // matches the class but not toDouble) drops THAT entry,
            // not the whole anchor (code-review r11 — a file-level
            // catch here misreported a parse issue as a missing file)
            .flatMap(x => x.group(2).toDoubleOption.map(x.group(1) -> _))
            .toMap
        case None => Map.empty
      }
      // unreadable/missing file only — fatal errors (OOM, interrupt)
      // must propagate, not silently disable regression diffing
      // (ADVICE r11)
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** The anchor's normalized values (BenchSpec's compatibility face). */
  private[graft] def readBaseline(path: String): Map[String, Double] =
    readBaselineKey(path, "queries_norm")

  /** The anchor's own probe trace (same regex device as readBaseline) —
    * the incumbent side of the mechanical promotion rule.
    */
  private[graft] def readProbeTrace(path: String): Seq[Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        "UTF-8")
      """"probe_trace"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt) match {
        case Some(m) =>
          m.group(1).split(",").toSeq
            .flatMap(s => s.trim.toDoubleOption)
        case None => Seq.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** The promotion rule, stated once: a candidate trace dominates iff
    * its min, median AND max are all ≤ the incumbent's (ties promote).
    */
  private[graft] def probeDominates(cand: Seq[Double],
                                    inc: Seq[Double]): Boolean =
    cand.nonEmpty && inc.nonEmpty &&
      cand.min <= inc.min &&
      BenchSupport.median(cand) <= BenchSupport.median(inc) &&
      cand.max <= inc.max

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    BenchSupport.warmTables(spark, sfDir)
    probeOnce(spark) // JIT/codegen warm for the probe shape itself
    val names = SparkEntry.queries.keys.toSeq.sorted
    // probes(i) brackets query i: probes(i) before, probes(i+1) after.
    val probes = new Array[Double](names.length + 1)
    probes(0) = probeOnce(spark)
    val results = names.zipWithIndex.map { case (name, i) =>
      BenchSupport.timeRep(spark, sfDir, name) // untimed warm rep (header §1)
      val times = (1 to Reps).map(_ => BenchSupport.timeRep(spark, sfDir, name))
      probes(i + 1) = probeOnce(spark)
      val good = times.filter(_ >= 0)
      val vMin = if (good.nonEmpty) good.min else -1.0
      val vMed = if (good.nonEmpty) BenchSupport.median(good) else -1.0
      (name, vMin, vMed, times)
    }
    val probeMin = probes.min
    val probeMed = BenchSupport.median(probes.toSeq)
    // normalized = min rep x (quietest probe / local probe level):
    // scales out the contention level measured NEXT to the query.
    def normalized(i: Int, vMin: Double): Double =
      if (vMin < 0) -1.0
      else vMin * (probeMin / math.max(1e-9, (probes(i) + probes(i + 1)) / 2))
    val norm = results.zipWithIndex.map { case ((n, vMin, _, _), i) =>
      n -> normalized(i, vMin)
    }
    val baseline = readBaseline("BENCH_BASELINE.json")
    val baselineRaw = readBaselineKey("BENCH_BASELINE.json", "queries")
    val rawMin = results.map { case (n, vMin, _, _) => n -> vMin }.toMap
    // both channels must agree (header): normalized ratio AND raw-min
    // ratio over threshold; reported ratio is the smaller of the two
    // (the conservative claim)
    val regressions = norm.collect {
      case (n, v)
        if v > 0 &&
          baseline.get(n).exists(b => b > 0 && v / b > RegressionRatio) &&
          baselineRaw.get(n).exists(b =>
            b > 0 && rawMin(n) > 0 && rawMin(n) / b > RegressionRatio) =>
        (n, math.min(v / baseline(n), rawMin(n) / baselineRaw(n)))
    }.sortBy(-_._2)
    def obj(pairs: Seq[(String, String)]): String =
      pairs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map { case (k, v, _, _) => k -> v.toString })
    val qsMed = obj(results.map { case (k, _, v, _) => k -> v.toString })
    val qsNorm = obj(norm.map { case (k, v) => k -> v.toString })
    val failed = results.collect { case (k, v, _, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val totalMed = results.collect { case (_, _, v, _) if v >= 0 => v }.sum
    val vsBaseline =
      if (baseline.isEmpty) "\"no parseable BENCH_BASELINE.json\""
      else obj(Seq(
        "baseline_queries" -> baseline.size.toString,
        "regressions_over_1_5x" -> regressions.length.toString,
        "worst" -> (if (regressions.isEmpty) "null"
                    else "\"" + regressions.head._1 + "\""),
        "worst_ratio" -> (if (regressions.isEmpty) "0"
                          else regressions.head._2.toString),
        "names" -> regressions.map("\"" + _._1 + "\"").mkString("[", ",", "]")))
    val json =
      s"""{"metric":"total_min_of_$Reps","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","total_median":$totalMed,"probe_min":$probeMin,"probe_median":$probeMed}"""
    // The driver captures one line; the persisted artifact additionally
    // carries every rep, the medians, the normalized values, the full
    // probe trace, and the baseline diff — so a contended run
    // self-diagnoses IN the artifact (probe spikes align with inflated
    // reps) and a regression is a one-field read.
    val reps = obj(results.map { case (k, _, _, ts) =>
      k -> ts.mkString("[", ",", "]")
    })
    val incProbe = readProbeTrace("BENCH_BASELINE.json")
    def probeStats(t: Seq[Double]): String = obj(Seq(
      "min" -> t.min.toString,
      "median" -> BenchSupport.median(t).toString,
      "max" -> t.max.toString))
    val anchorCandidate =
      if (incProbe.isEmpty) "\"no incumbent probe trace\""
      else obj(Seq(
        "dominates" -> probeDominates(probes.toSeq, incProbe).toString,
        "candidate_probe" -> probeStats(probes.toSeq),
        "incumbent_probe" -> probeStats(incProbe)))
    val fileJson = json.dropRight(1) +
      s""","queries_median":$qsMed,"queries_norm":$qsNorm,"reps":$reps,"probe_trace":${probes.mkString("[", ",", "]")},"vs_baseline":$vsBaseline,"anchor_candidate":$anchorCandidate}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (fileJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // benchmark output must never fail the run
    spark.stop()
  }
}
