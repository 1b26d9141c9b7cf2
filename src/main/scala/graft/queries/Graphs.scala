package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the dedup-cluster operators
  * (embedding near-dups in VectorQueries, MinHash near-dups in
  * TextQueries). One implementation, so the two cluster operators can
  * never diverge in labeling semantics.
  */
private[queries] object Graphs {

  /** Connected components by iterative min-label propagation (the
    * Pregel/large-star pattern) over an UNDIRECTED edge list given as
    * (da, db) pairs: each round is one hash join + aggregation,
    * converging in O(component diameter) rounds — the loop is driver
    * CONTROL FLOW only; all data stays distributed. Every round
    * eagerly materializes its result: each iteration references the
    * previous labels twice, so WITHOUT lineage truncation the logical
    * plan doubles per round (exponential planning blow-up — the
    * classic iterative-DataFrame trap; GraphX materializes per round
    * for the same reason). The materialization strategy is INJECTABLE:
    * the default eager localCheckpoint is right for a single-box run;
    * at 100 TB pass `_.checkpoint(true)` (reliable checkpoint to the
    * cluster checkpoint dir) so a lost executor replays from storage
    * instead of recomputing a truncated lineage it no longer has —
    * GraphsSpec drives the loop under both strategies.
    * Min-propagation has a unique fixpoint, so the result is order-
    * and partitioning-independent — matched by a recursive-CTE
    * transitive closure in the oracles.
    *
    * Returns (id, comp): every vertex that appears in an edge, labeled
    * by its component's smallest member. All working blocks are
    * released before returning; only the (result-sized) label table
    * stays resident.
    */
  def connectedComponents(
      pairs: DataFrame,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame =
    withRounds(pairs, materialize)._1

  /** Instrumented twin: also returns the number of propagation rounds
    * the loop executed (the convergence-detection iterations). Spec
    * hook for the O(diameter) contract — a path graph converges in
    * ~diameter rounds, a star in one.
    */
  private[graft] def withRounds(
      pairs: DataFrame,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : (DataFrame, Int) = {
    // Materialize the pair source ONCE before symmetrizing: the union
    // references it from two branches, and without this checkpoint the
    // whole upstream pair pipeline (LSH + verify for the MinHash
    // caller) executes twice.
    val p0 = materialize(pairs.select(col("da"), col("db")))
    val edges = materialize(
      p0.unionAll(p0.select(col("db").as("da"), col("da").as("db"))))
    p0.unpersist()
    // Seed each vertex with min(id, direct neighbors) — identical to
    // the state after one propagation round from comp=id, so the loop
    // starts a full (join+agg+join+materialize) iteration ahead. One
    // aggregation over the (symmetrized) edge list; every vertex
    // appears as `da` there, so the vertex set is unchanged.
    var comp = materialize(edges.groupBy(col("da"))
      .agg(min(col("db")).as("nmin"))
      .select(col("da").as("id"), least(col("da"), col("nmin")).as("comp")))
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      val nbrMin = edges
        .join(comp.select(col("id").as("db"), col("comp")), "db")
        .groupBy(col("da").as("nid")).agg(min(col("comp")).as("ncomp"))
      // Carry the previous label through the propagation join so
      // convergence detection is a filter+count over the freshly
      // checkpointed blocks, not an extra per-round join.
      val next = materialize(comp
        .join(nbrMin, comp("id") === nbrMin("nid"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp")))
      changed = next.filter(col("comp") =!= col("old")).count()
      comp.unpersist()
      comp = next
    }
    // Materialize the answer into its own (small, result-sized)
    // checkpoint, then release every working block: `edges` and the
    // final label table would otherwise stay pinned in the block
    // manager across Verify's sweep and Bench's repeated runs
    // (clearCache() does not free localCheckpoint RDD blocks).
    val result = materialize(comp.select(col("id"), col("comp")))
    comp.unpersist()
    edges.unpersist()
    (result, rounds)
  }
}
