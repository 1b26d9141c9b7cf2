package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftSpec

/** Property tests for the shared connected-components loop — the most
  * intricate distributed algorithm in the repo (iterative min-label
  * propagation with per-round lineage truncation), pinned against a
  * trivially-correct driver-side union-find on random graphs. Both
  * dedup cluster operators (embedding + MinHash) ride on this.
  * Generators are seed-fixed `Gen`s, the repo's reproducible-property
  * pattern (see ExactlyOnceSpec).
  */
class GraphsSpec extends GraftSpec {
  import spark.implicits._

  /** Reference labeling: plain union-find, component = smallest member
    * (unions always point the larger root at the smaller, so each
    * tree's final root is its component's minimum).
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(v => v -> find(v)).toMap
  }

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.connectedComponents(edges.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val edgeListGen: Gen[List[(Long, Long)]] = for {
    nv <- Gen.choose(4L, 24L)
    ne <- Gen.choose(1, 30)
    edges <- Gen.listOfN(ne,
      Gen.zip(Gen.choose(0L, nv), Gen.choose(0L, nv)))
  } yield edges.filter { case (a, b) => a != b }

  test("connectedComponents equals union-find on random graphs") {
    for (i <- 0 until 10) {
      val edges = edgeListGen
        .pureApply(Gen.Parameters.default, Seed(1234L + i))
      if (edges.nonEmpty)
        assert(cc(edges) === unionFind(edges), s"case $i: $edges")
    }
  }

  test("single edge, chain, and two disjoint triangles label by smallest member") {
    assert(cc(Seq((7L, 3L))) === Map(7L -> 3L, 3L -> 3L))
    // a long chain exercises multi-round convergence (diameter 9)
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(cc(chain) === (0L to 9L).map(_ -> 0L).toMap)
    val tris = Seq((1L, 2L), (2L, 5L), (5L, 1L), (10L, 11L), (11L, 12L))
    assert(cc(tris) ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }
}
