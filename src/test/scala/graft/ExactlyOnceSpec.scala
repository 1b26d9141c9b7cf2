package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Core

/** Property-based exactly-once specs (SURVEY.md §5): for random record
  * multisets with random duplicate/redelivery injection, dedup-then-count
  * equals the count over the unique records — the invariant the
  * reference enforces with its dedup set + ack/retry + WAL
  * (rainstorm/server.go:292-298, 376-408). Generators are scalacheck
  * `Gen` driven from a fixed seed so runs are reproducible.
  */
class ExactlyOnceSpec extends GraftSpec {
  import spark.implicits._

  private val caseGen: Gen[(List[(String, String)], Int)] = for {
    n <- Gen.choose(1, 30)
    recs <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 1000).map("id" + _)
      key <- Gen.oneOf("a", "b", "c", "d")
    } yield (id, key))
    dup <- Gen.choose(1, 3)
  } yield (recs, dup)

  private def samples(count: Int): Seq[(List[(String, String)], Int)] =
    (0 until count).map(i =>
      caseGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("dedup+count is invariant under redelivery (exactly-once)") {
    for (((recs, dup), i) <- samples(10).zipWithIndex) {
      val unique = recs.distinctBy(_._1)
      val delivered = new scala.util.Random(i).shuffle(
        unique.flatMap(r => List.fill(dup)(r)))
      val df = delivered.toDF("id", "key")
      val counts = Core.countByKey(
        Core.dedupById(Seq("id"))(df).select(col("key")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = unique.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      assert(counts === expected, s"case $i: $delivered")
    }
  }

  test("dedup is idempotent: applying twice equals applying once") {
    for (((recs, dup), i) <- samples(5).zipWithIndex) {
      val delivered = recs.flatMap(r => List.fill(dup)(r))
      val df = delivered.toDF("id", "key")
      val once = Core.dedupById(Seq("id"))(df)
      val twice = Core.dedupById(Seq("id"))(once)
      assert(twice.count() === once.count(), s"case $i")
    }
  }
}
