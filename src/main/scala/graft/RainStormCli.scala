package graft

import org.apache.spark.sql.SparkSession

import graft.RainStorm.{Ops, RsOp}

/** Runnable front door matching the reference's REPL commands
  * (`main.go:206-243`):
  *
  * {{{
  * runMain graft.RainStormCli [RainStorm|RainStormWithFail] \
  *   <op1> <op2> <src> <dest> <numTasks> [pattern...]
  * }}}
  *
  * The leading verb is optional (bare args run the plain job, matching
  * the previous argv surface). `RainStormWithFail` is the reference's
  * chaos verb (main.go:223-243): run the same job but kill two live
  * workers mid-run and still produce the identical output — here two
  * task attempts are killed via `RainStorm.Chaos` and the scheduler's
  * retry + lineage replay provides the equivalence (the reference
  * sleeps 1.5 s then `KillRandom(2)`; arming before the run and firing
  * on the first two in-task deliveries injects at the same point of the
  * job's life: mid-execution, after work has started flowing).
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
    val (withFail, rest) = args.headOption match {
      case Some("RainStormWithFail") => (true, args.tail)
      case Some("RainStorm")         => (false, args.tail)
      case _                         => (false, args)
    }
    require(rest.length >= 5,
      "usage: RainStormCli [RainStorm|RainStormWithFail] " +
        "<op1> <op2> <src> <dest> <numTasks> [pattern...]")
    val Array(op1, op2, src, dest, numTasks) = rest.take(5)
    val pattern = rest.drop(5).mkString(" ")
    if (withFail) RainStorm.Chaos.arm(2) // the reference's KillRandom(2)
    RainStorm.run(spark, src, resolve(op1), resolve(op2),
      Some(dest), numTasks.toInt, pattern)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-rainstorm")
    try runCli(spark, args)
    finally spark.stop()
  }
}
