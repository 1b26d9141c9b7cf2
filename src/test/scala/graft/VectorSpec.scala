package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Specs for the native vector expressions: interpreted eval vs codegen
  * parity, left-to-right accumulation order, and signature banding.
  */
class VectorSpec extends GraftSpec {
  import spark.implicits._

  private val W = Array.tabulate(4, 3)((j, i) => (j + 1) * (i + 1) - 2)

  test("FloatDotProduct matches a hand left-to-right accumulation") {
    val x = Seq(0.25f, -1.5f, 3.0f)
    val y = Seq(2.0f, 0.5f, -0.125f)
    val expected = x.zip(y).foldLeft(0.0) { case (a, (xi, yi)) =>
      a + xi.toDouble * yi.toDouble
    }
    val got = Seq((x, y)).toDF("x", "y")
      .select(VectorFunctions.dotF(col("x"), col("y")).as("d"))
      .head().getDouble(0)
    assert(got === expected)
  }

  test("FloatDotProduct null-safe on null arrays") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("x", "y")
    assert(df.select(VectorFunctions.dotF(col("x"), col("y"))).head().isNullAt(0))
  }

  test("HyperplaneSignature sets bit j iff weighted sum positive") {
    // weights row j = [(j+1)*1-2, (j+1)*2-2, (j+1)*3-2]
    val v = Seq(1.0f, 0.0f, 0.0f)
    val expected = (0 until 4).map { j =>
      if (W(j)(0) * 1.0 > 0) 1L << j else 0L
    }.sum
    val got = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.hyperplaneSig(col("v"), W).as("s"))
      .head().getLong(0)
    assert(got === expected)
  }

  test("LSH candidate set is sublinear in the pair space and non-empty") {
    val d = "/root/testdata/sf0.01"
    val n = graft.Tables.embeddings(spark, d).count()
    val cand = graft.queries.VectorQueries.annCandidates(spark, d).count()
    val pairSpace = 100 * (n - 1) // 100 queries x full corpus = brute force
    assert(cand > 0, "banded candidates must exist")
    assert(cand < pairSpace / 5,
      s"multi-probe candidates ($cand) must stay well under brute-force ($pairSpace)")
  }

  test("identical vectors share the full signature (near-dup contract)") {
    val w = Array.tabulate(16, 8)((j, i) => ((j * 31 + i * 7) % 11) - 5)
    val v = Seq.tabulate(8)(i => (i * 0.37f) - 1.1f)
    val df = Seq(Tuple1(v), Tuple1(v)).toDF("v")
      .select(VectorFunctions.hyperplaneSig(col("v"), w).as("s"))
    assert(df.distinct().count() === 1)
  }
}
