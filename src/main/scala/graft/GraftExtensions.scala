package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BinaryByteStats, FloatDotProduct, PpmPhashBands}

/** SparkSessionExtensions wiring: exposes graft's native expressions to
  * the SQL surface (`SELECT float_dot(a.embedding, b.embedding) ...`),
  * so SQL users get the same codegen'd operators as the DataFrame API.
  *
  * Registered via `builder.withExtensions(new GraftExtensions)` (see
  * GraftSession), `spark.sql.extensions=graft.GraftExtensions`, or —
  * for an already-running session (getOrCreate ignores withExtensions
  * on reuse) — `GraftExtensions.install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1))),
    (new FunctionIdentifier("byte_stats"),
      new ExpressionInfo(classOf[BinaryByteStats].getName, "byte_stats"),
      (children: Seq[Expression]) => BinaryByteStats(children.head)),
    (new FunctionIdentifier("ppm_phash_bands"),
      new ExpressionInfo(classOf[PpmPhashBands].getName, "ppm_phash_bands"),
      (children: Seq[Expression]) => children match {
        // 1-arg: default 8×8/8 geometry; 3-arg: explicit (grid, nBands)
        // scale knob — both must be integer literals (the geometry is a
        // plan-time constant, like a bucket count)
        case Seq(payload) => PpmPhashBands(payload)
        case Seq(payload, g, nb) =>
          def lit(e: Expression, name: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case _ => throw new IllegalArgumentException(
              s"ppm_phash_bands: $name must be an integer literal, got $e")
          }
          PpmPhashBands(payload, lit(g, "grid"), lit(nb, "nBands"))
        case _ => throw new IllegalArgumentException(
          "ppm_phash_bands takes (payload) or (payload, grid, nBands)")
      }),
    // The content-defined chunker on the SQL surface: cdc_chunks(text)
    // → array<struct<n_words bigint, chunk_fp string>>, composed from
    // the SAME stage functions cdcChunkRows uses (one definition of
    // the boundary rule; ExtensionsSpec pins the equality).
    (new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo("graft.queries.CurationQueries", "cdc_chunks"),
      (children: Seq[Expression]) => children match {
        case Seq(text) =>
          org.apache.spark.sql.graft.Shim.expressionTree(
            graft.queries.CurationQueries.cdcChunkArray(
              org.apache.spark.sql.graft.Shim.column(text)))
        case _ => throw new IllegalArgumentException(
          "cdc_chunks takes exactly one argument: (text)")
      }))

  /** Register into a live session (post-hoc equivalent of the builder
    * extension path).
    */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
