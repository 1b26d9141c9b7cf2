package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins.
  *
  * The companion to Core's two-phase salted COUNT (the reference's A1
  * under a hot key, rainstorm/server.go:39 state model): when ONE join
  * key carries a disproportionate share of the large side, a plain
  * shuffle join stalls on the one reducer that owns it. Salting spreads
  * the large side over `buckets` sub-keys and replicates the small side
  * once per bucket, so the hot key occupies `buckets` reducers.
  *
  * The result is EXACTLY the plain inner join — the salt never reaches
  * the output; only the exchange layout changes. This is the manual,
  * plan-pinned form of what AQE's skew-join does adaptively at runtime
  * (both are enabled in GraftSession); ship this one when the skew is
  * known ahead of time and the small side is too large to broadcast
  * but cheap to replicate `buckets`×.
  */
object Skew {

  /** Inner-join `large` with `small` on the equi-key `key` (same column
    * name on both sides), spreading each key over `buckets` sub-keys.
    *
    * The large side's salt comes from a per-row id, NOT from data — any
    * value joins the replicated small side regardless of which salt a
    * task retry assigns, so recomputation is safe.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val l = large.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
