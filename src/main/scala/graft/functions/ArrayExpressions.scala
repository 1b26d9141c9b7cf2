package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Intersection size of two SORTED integral arrays by linear merge — the
  * set-similarity verification kernel. `array_intersect` builds a hash
  * set per call; for the LSH verify stage (millions of candidate pairs
  * x ~50-element shingle-id sets) the branch-predictable merge loop is
  * several times cheaper and allocation-free.
  *
  * Element width follows the input array type (int or long — shingle
  * ids are xxhash64 longs).
  *
  * Inputs MUST be sorted ascending and duplicate-free (graft builds
  * them with array_sort over distinct ids); outputs are undefined
  * otherwise.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val long = isLong
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = if (long) a.getLong(i) else a.getInt(i).toLong
      val y = if (long) b.getLong(j) else b.getInt(j).toLong
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val jt = if (isLong) "long" else "int"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everything: whole-stage codegen inlines this block into
      // a method that may already declare `i`/`n`, and Java rejects
      // shadowing an enclosing local — the collision killed codegen for
      // the whole stage (silent interpreted-mode fallback).
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
      int $na = $a.numElements(), $nb = $b.numElements();
      int $i = 0, $j = 0, $n = 0;
      while ($i < $na && $j < $nb) {
        $jt $x = $a.get${if (isLong) "Long" else "Int"}($i);
        $jt $y = $b.get${if (isLong) "Long" else "Int"}($j);
        if ($x == $y) { $n++; $i++; $j++; }
        else if ($x < $y) { $i++; } else { $j++; }
      }
      ${ev.value} = $n;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** |a ∩ b| for sorted duplicate-free int or long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Shim.column(SortedIntersectCount(Shim.expression(a), Shim.expression(b)))
}
