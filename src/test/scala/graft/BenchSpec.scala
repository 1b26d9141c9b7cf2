package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench protocol plumbing (no SparkSession needed): the
  * BENCH_BASELINE.json extractor must read exactly the `queries_norm`
  * object Bench itself writes — a silent parse-to-empty would turn the
  * regression diff into a permanent "no baseline" no-op.
  */
class BenchSpec extends AnyFunSuite {

  private def withTempJson(content: String)(body: String => Unit): Unit = {
    val f = java.nio.file.Files.createTempFile("bench-baseline", ".json")
    try {
      java.nio.file.Files.write(f, content.getBytes("UTF-8"))
      body(f.toString)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("readBaseline extracts queries_norm pairs from a Bench-written artifact") {
    val json = """{"metric":"total_min_of_3","value":1.5,""" +
      """"queries":{"a":2.0,"b":3.0},""" +
      """"queries_norm":{"a":1.25,"b":-1.0,"c_x":4.5e-2},""" +
      """"reps":{"a":[1,2]},"probe_trace":[0.1,0.2]}"""
    withTempJson(json) { p =>
      val m = Bench.readBaseline(p)
      assert(m === Map("a" -> 1.25, "b" -> -1.0, "c_x" -> 0.045))
    }
  }

  test("readBaseline is total: missing file, malformed JSON, absent key -> empty") {
    assert(Bench.readBaseline("/nonexistent/path.json") === Map.empty)
    withTempJson("""{"queries":{"a":1.0}}""") { p =>
      assert(Bench.readBaseline(p) === Map.empty)
    }
    withTempJson("not json at all") { p =>
      assert(Bench.readBaseline(p) === Map.empty)
    }
  }

  test("readBaselineKey selects exactly the named object (queries vs queries_norm)") {
    // The dual-channel diff (r12) reads the anchor's RAW mins too; the
    // regex must not confuse "queries" with "queries_norm" or
    // "queries_median".
    val json = """{"queries":{"a":2.0},"queries_median":{"a":9.0},""" +
      """"queries_norm":{"a":1.25},"probe_trace":[0.1]}"""
    withTempJson(json) { p =>
      assert(Bench.readBaselineKey(p, "queries") === Map("a" -> 2.0))
      assert(Bench.readBaselineKey(p, "queries_norm") === Map("a" -> 1.25))
      assert(Bench.readBaselineKey(p, "queries_median") === Map("a" -> 9.0))
    }
    val raw = Bench.readBaselineKey("BENCH_BASELINE.json", "queries")
    assert(raw.size > 170, s"anchor raw-min channel parsed only ${raw.size}")
  }

  test("anchor promotion is mechanical: dominance = min AND median AND max all <=") {
    // The rule that replaced the "quietest of four runs" judgment call
    // (r11 verdict #4): a candidate run may replace the anchor only if
    // its probe trace dominates the incumbent's at every summary point.
    val inc = Seq(0.10, 0.20, 0.30)
    assert(Bench.probeDominates(Seq(0.09, 0.19, 0.29), inc))
    assert(Bench.probeDominates(inc, inc), "ties must promote")
    // better min and median but a worse max — a run with one loud
    // stretch must NOT displace a uniformly quiet anchor
    assert(!Bench.probeDominates(Seq(0.05, 0.15, 0.31), inc))
    // better max but worse min
    assert(!Bench.probeDominates(Seq(0.11, 0.20, 0.29), inc))
    assert(!Bench.probeDominates(Seq.empty, inc), "empty candidate never promotes")
    assert(!Bench.probeDominates(inc, Seq.empty), "no incumbent trace -> not comparable here")
  }

  test("readProbeTrace reads the incumbent trace from a Bench-written artifact") {
    withTempJson("""{"queries_norm":{"a":1.0},"probe_trace":[0.1,0.25,0.2]}""") { p =>
      assert(Bench.readProbeTrace(p) === Seq(0.1, 0.25, 0.2))
    }
    assert(Bench.readProbeTrace("/nonexistent/path.json") === Seq.empty)
    val committed = Bench.readProbeTrace("BENCH_BASELINE.json")
    assert(committed.size > 100,
      s"committed anchor must carry its full probe trace (got ${committed.size})")
  }

  test("the committed BENCH_BASELINE.json anchor parses non-empty") {
    // The anchor the regression diff depends on: if a future edit
    // breaks its shape (or the file is dropped), this fails instead of
    // Bench silently reporting "no baseline" forever.
    val m = Bench.readBaseline("BENCH_BASELINE.json")
    assert(m.size > 170, s"baseline anchor parsed only ${m.size} queries")
    assert(m.values.forall(v => v > 0 || v === -1.0),
      "normalized values must be positive (or -1 for a failed query)")
  }
}
