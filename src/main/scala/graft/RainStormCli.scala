package graft

import org.apache.spark.sql.SparkSession

import graft.RainStorm.{Ops, RsOp}

/** Runnable front door matching the reference's REPL command
  * (`main.go:206-222`):
  *
  * {{{
  * runMain graft.RainStormCli <op1> <op2> <src> <dest> <numTasks> [pattern...]
  * }}}
  *
  * Operator names are the reference's demo executable names; remaining
  * args past numTasks join into the pattern (the reference does
  * `strings.Join(text[6:], " ")` so patterns may contain spaces).
  * The result is written to `<dest>` as `key,value` lines — the
  * leader's sink format (rainstorm/types.go:79).
  */
object RainStormCli {

  /** The reference's four demo operator executables (ops/ directory). */
  private val builtins: Map[String, RsOp] = Map(
    "app1op1" -> Ops.app1op1,
    "app1op2" -> Ops.app1op2,
    "app2op1" -> Ops.app2op1,
    "app2op2" -> Ops.app2op2)

  private def resolve(name: String): RsOp =
    builtins.getOrElse(name, throw new IllegalArgumentException(
      s"unknown operator '$name' (known: ${builtins.keys.toSeq.sorted.mkString(", ")})"))

  /** CLI body against a caller-owned session (testable; `main` owns its
    * session lifecycle, specs pass the suite session).
    */
  def runCli(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: RainStormCli <op1> <op2> <src> <dest> <numTasks> [pattern...]")
    val Array(op1, op2, src, dest, numTasks) = args.take(5)
    val pattern = args.drop(5).mkString(" ")
    RainStorm.run(spark, src, resolve(op1), resolve(op2),
      Some(dest), numTasks.toInt, pattern)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-rainstorm")
    try runCli(spark, args)
    finally spark.stop()
  }
}
