package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.RainStorm.{Ops, RsOp}
import graft.sources.Hyfs

/** Runnable front door matching the reference's REPL commands
  * (`main.go:206-243`):
  *
  * {{{
  * runMain graft.RainStormCli [RainStorm|RainStormWithFail] \
  *   <op1> <op2> <src> <dest> <numTasks> [pattern...]
  * runMain graft.RainStormCli [loop]    // the reference's REPL (stdin)
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

  /** Membership/suspicion verbs: SWIM introspection is delegated to the
    * cluster manager's executor liveness (SURVEY §2.2 non-goals; verb
    * mapping documented in Hyfs's header).
    */
  private val MembershipVerbs = Set("list_mem", "list_mem_ids", "list_self",
    "leave", "enable_sus", "disable_sus", "status_sus")

  private def readLocal(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), UTF_8)

  /** The reference's long-lived REPL loop (main.go:78-253): read one
    * command per line, dispatch, keep going — errors print and the loop
    * continues, exactly like the reference's per-verb error prints. The
    * verbs and their argument ORDERS are the reference's:
    *
    *  - `create <local> <dfs>` / `append <local> <dfs>` (main.go:116-136)
    *  - `get <dfs> <local>` (main.go:124-129)
    *  - `ls [<dfs>]` — block list of a DFS file; bare `ls` lists the
    *    working directory like util.Ls() (main.go:138-143)
    *  - `cat <local>` (main.go:144-149)
    *  - `multiappend <dfs> <vm1,vm2,..> <local1,local2,..>` — the vm ids
    *    name WHICH MACHINES append in the reference (main.go:170-192);
    *    here appends are concurrent writer threads, so the ids only
    *    arity-check against the file list (same validation messages)
    *  - `merge <dfs>` (main.go:198-204)
    *  - `RainStorm` / `RainStormWithFail` (main.go:206-243) → runCli
    *  - replica introspection (`store`, `getfromreplica`) and SWIM
    *    membership verbs print their documented delegation (Hyfs header)
    *  - empty lines skip; unknown verbs print "Invalid command"; EOF or
    *    `exit` ends the loop (the reference ends on readline EOF)
    */
  def runLoop(spark: SparkSession, in: java.io.BufferedReader,
              out: java.io.PrintStream): Unit = {
    var line = in.readLine()
    while (line != null) {
      val text = line.trim.split("\\s+").filter(_.nonEmpty)
      try {
        text.headOption match {
          case None => ()
          case Some("exit") => return
          case Some("create") =>
            if (text.length < 3) out.println("Missing parameters")
            else Hyfs.create(spark, text(2), readLocal(text(1)))
          case Some("append") =>
            if (text.length < 3) out.println("Missing parameters")
            else Hyfs.append(spark, text(2), readLocal(text(1)))
          case Some("get") =>
            if (text.length < 3) out.println("Missing parameters")
            else Files.write(Paths.get(text(2)),
              Hyfs.get(spark, text(1)).getBytes(UTF_8))
          case Some("ls") =>
            if (text.length < 2)
              Option(new java.io.File(".").list()).getOrElse(Array.empty[String])
                .sorted.foreach(out.println)
            else Hyfs.ls(spark, text(1)).foreach(out.println)
          case Some("cat") =>
            if (text.length < 2) out.println("Missing parameters")
            else out.println(readLocal(text(1)))
          case Some("multiappend") =>
            if (text.length < 4) out.println("Missing parameters")
            else {
              val vms = text(2).split(",").filter(_.nonEmpty)
              val locals = text(3).split(",").filter(_.nonEmpty)
              if (vms.length > locals.length)
                out.println(s"Missing filenames, expecting ${vms.length} " +
                  s"but got ${locals.length}")
              else if (locals.length > vms.length)
                out.println(s"Missing Vms, expecting ${locals.length} " +
                  s"but got ${vms.length}")
              else Hyfs.multiappend(spark, text(1),
                locals.toSeq.map(readLocal))
            }
          case Some("merge") =>
            if (text.length < 2) out.println("Missing parameters")
            else Hyfs.merge(spark, text(1))
          case Some("store") | Some("getfromreplica") =>
            out.println("delegated: block placement lives below the FS API " +
              "here — use ls for the block set (Hyfs header, verb mapping)")
          case Some(v) if MembershipVerbs(v) =>
            out.println("delegated: membership is the cluster manager's " +
              "executor liveness (Hyfs header, verb mapping)")
          case Some("RainStorm") | Some("RainStormWithFail") =>
            if (text.length < 6) out.println("Missing parameters")
            else runCli(spark, text)
          case Some(_) => out.println("Invalid command")
        }
      } catch {
        // verb errors print and the loop continues (main.go prints err)
        case e: Exception => out.println(Option(e.getMessage).getOrElse(e.toString))
      }
      line = in.readLine()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-rainstorm")
    try {
      // bare invocation (or the explicit `loop` verb) enters the REPL —
      // the reference's entry point IS the command loop; one-shot argv
      // stays for scripted single jobs.
      if (args.isEmpty || args.sameElements(Array("loop")))
        runLoop(spark,
          new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
          System.out)
      else runCli(spark, args)
    } finally spark.stop()
  }
}
