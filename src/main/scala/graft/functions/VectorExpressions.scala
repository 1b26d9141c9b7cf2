package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector operators.
  *
  * A naive Column-DSL encoding of a 64-dim dot product (64 Multiply/Add
  * nodes) or a 16-hyperplane signature (1024 nodes) blows whole-stage
  * codegen past the JVM's 64KB method limit, dropping the whole stage to
  * interpreted mode and bloating Catalyst planning. These expressions
  * generate a tight loop instead — one method call per row, fully inside
  * WholeStageCodegen.
  *
  * Determinism contract with the DuckDB oracle: accumulation is a plain
  * left-to-right loop (`acc += w*x`), bit-identical to the oracle's
  * left-associative explicit SQL sum `(t1 + t2) + t3 ...` (IEEE double
  * addition, same operand order; the leading `0.0 + t1` is exact).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // Declared element types make misuse an ANALYSIS error: the codegen
  // below reads raw 4-byte slots (getFloat), so an array<double> input
  // would silently return garbage, not fail (ADVICE r11).
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName every local (incl. loop vars): Java forbids shadowing an
      // enclosing local, and whole-stage codegen may inline this next to
      // another `i`/`n` — a collision kills codegen for the entire stage.
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
      int $n = Math.min($x.numElements(), $y.numElements());
      double $acc = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
      }
      ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** k-bit (k ≤ 64) random-hyperplane signature of a float vector: bit j is
  * set iff `sum_i weights(j)(i) * v(i) > 0`. Weights are plan-time
  * constants (shipped via codegen reference objects), so the expression is
  * pure and foldable-free.
  */
case class HyperplaneSignature(child: Expression, weights: Array[Array[Int]])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  // getFloat over raw slots — see FloatDotProduct.inputTypes.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  protected override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sg = 0L
    var j = 0
    while (j < weights.length) {
      val w = weights(j)
      val n = math.min(w.length, v.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += w(i) * v.getFloat(i).toDouble
        i += 1
      }
      if (acc > 0) sg |= 1L << j
      j += 1
    }
    sg
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      // freshName every local — see FloatDotProduct.doGenCode.
      val sg = ctx.freshName("sg"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
      long $sg = 0L;
      for (int $j = 0; $j < $wRef.length; $j++) {
        int[] $w = $wRef[$j];
        int $n = Math.min($w.length, $v.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $w[$i] * (double) $v.getFloat($i);
        }
        if ($acc > 0) $sg |= 1L << $j;
      }
      ${ev.value} = $sg;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

/** Exact integer squared-L2 distance between two long arrays — the PQ
  * subspace-distance kernel. Integer addition is associative, so the
  * result is order-independent and exactly mirrors the oracle's
  * list_reduce fold; the point of the native form is the hot path:
  * pqAssign evaluates this corpus × PqM × k times (2M rows at the
  * k = 128 registered IVFADC geometry), where the zip_with + aggregate
  * HOF encoding allocates an intermediate array per row and evaluates
  * its lambda interpreted — this is one tight codegen'd loop instead
  * (measured 10.5 → ~6.5 s on ann_ivfpq_topk at sf0.1).
  */
case class LongArrayL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_l2"
  // The loop reads 8-byte slots (getLong); on array<int> / array<double>
  // it would return garbage instead of failing analysis — declare the
  // element type so misuse is an AnalysisException (ADVICE r11).
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  // NULL semantics mirror the zip_with+aggregate HOF this replaced
  // (code-review r11): a null element poisons the term and the sum —
  // result NULL; a length mismatch means zip_with's null padding would
  // poison it too — result NULL. Today's quantized arrays have neither,
  // but the kernel is general-purpose in VectorFunctions.
  override def nullable: Boolean = true

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName every local — see FloatDotProduct.doGenCode.
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
      int $n = $x.numElements();
      if ($n != $y.numElements()) {
        ${ev.isNull} = true;
      } else {
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
          long $d = $x.getLong($i) - $y.getLong($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayL2 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Exact float-array dot product as double (left-to-right accumulation). */
  def dotF(x: Column, y: Column): Column =
    Shim.column(FloatDotProduct(Shim.expression(x), Shim.expression(y)))

  /** Exact integer squared L2 between long arrays (PQ distance kernel). */
  def longL2(x: Column, y: Column): Column =
    Shim.column(LongArrayL2(Shim.expression(x), Shim.expression(y)))

  /** Random-hyperplane LSH signature with the given integer weight rows. */
  def hyperplaneSig(v: Column, weights: Array[Array[Int]]): Column =
    Shim.column(HyperplaneSignature(Shim.expression(v), weights))
}
