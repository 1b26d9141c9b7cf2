package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Per-payload byte statistics over a binary column in one pass:
  * struct(n_bytes, sum_bytes, min_byte, max_byte). Unsigned byte values
  * (0..255); empty payloads yield null min/max.
  *
  * Integer-only arithmetic keeps the result exactly portable to the
  * DuckDB oracle. CodegenFallback is deliberate: the hot loop is
  * compiled JVM code either way, and a struct-producing expression
  * doesn't benefit enough from doGenCode to justify hand-writing
  * UnsafeRow construction.
  */
case class BinaryByteStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("sum_bytes", LongType, nullable = false),
    StructField("min_byte", IntegerType),
    StructField("max_byte", IntegerType)))

  override def prettyName: String = "byte_stats"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var sum = 0L
    var mn = 256
    var mx = -1
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    new GenericInternalRow(Array[Any](
      bytes.length.toLong, sum,
      if (bytes.isEmpty) null else mn,
      if (bytes.isEmpty) null else mx))
  }

  override protected def withNewChildInternal(newChild: Expression): BinaryByteStats =
    copy(child = newChild)
}

/** Perceptual hash of a PPM P6 payload as `nBands` bands of
  * grid²/nBands bits each (array<int>, band k = hash bits
  * [k·bandBits, (k+1)·bandBits)) — the banded form feeds LSH-style
  * bucketing directly, so the hash never needs re-splitting in the
  * plan. Geometry is the SCALE KNOB (constructor args, SQL args 2+3):
  * the 8×8/8 default is exact to hamming 7 with 256 buckets per band;
  * 16×16/16 (the billion-image configuration) is exact to hamming 15
  * with 65 536 buckets per band — pigeonhole exactness ≤ nBands−1
  * either way. NULL for payloads that are not well-formed P6 images
  * (the codec decides; MediaOps.Codec.phashBands holds the math).
  * CodegenFallback for the same reason as BinaryByteStats: the pixel
  * loop is compiled JVM code either way.
  */
case class PpmPhashBands(child: Expression, grid: Int = 8, nBands: Int = 8)
    extends UnaryExpression with CodegenFallback {

  // Geometry is a PLAN-TIME constant: validate at construction (the
  // expression is built while the plan is, so a bad (grid, nBands)
  // from SQL or the DataFrame API fails at analysis time, not as a
  // task-level error mid-scan). Same rule as the codec's eval-time
  // require, which stays for direct Codec.phashBands callers.
  require(grid > 0 && nBands > 0 &&
    grid.toLong * grid <= Int.MaxValue &&
    (grid.toLong * grid) % nBands == 0 &&
    grid.toLong * grid / nBands <= 31,
    s"phash geometry $grid×$grid/$nBands: cells must fit an Int and " +
      "split evenly into bands of <= 31 bits (band values are Ints)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ppm_phash_bands"

  protected override def nullSafeEval(input: Any): Any =
    graft.multimodal.MediaOps.Codec
      .phashBands(input.asInstanceOf[Array[Byte]], grid, nBands)
      .map(a => new org.apache.spark.sql.catalyst.util.GenericArrayData(a))
      .orNull

  override protected def withNewChildInternal(newChild: Expression): PpmPhashBands =
    copy(child = newChild)
}

object BinaryFunctions {
  /** One-pass byte stats struct for a binary column. */
  def byteStats(payload: Column): Column =
    Shim.column(BinaryByteStats(Shim.expression(payload)))

  /** Perceptual-hash bands of a P6 image payload at the default
    * 8×8/8-band geometry (null when the payload is not a P6 image). */
  def ppmPhashBands(payload: Column): Column =
    Shim.column(PpmPhashBands(Shim.expression(payload)))

  /** Perceptual-hash bands at an explicit (grid, nBands) geometry —
    * the scale knob: 16×16/16 bands is the billion-image
    * configuration (exact to hamming 15, 65 536 buckets per band). */
  def ppmPhashBands(payload: Column, grid: Int, nBands: Int): Column =
    Shim.column(PpmPhashBands(Shim.expression(payload), grid, nBands))
}
