package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BinaryByteStats, FloatDotProduct}

/** SparkSessionExtensions wiring: exposes graft's native expressions to
  * the SQL surface (`SELECT float_dot(a.embedding, b.embedding) ...`),
  * so SQL users get the same codegen'd operators as the DataFrame API.
  *
  * Registered via `builder.withExtensions(new GraftExtensions)` (see
  * GraftSession) or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("byte_stats"),
      new ExpressionInfo(classOf[BinaryByteStats].getName, "byte_stats"),
      (children: Seq[Expression]) => BinaryByteStats(children.head)))
  }
}
