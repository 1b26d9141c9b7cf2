package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.RainStorm.Ops

/** End-to-end specs for the RainStorm migration facade on
  * TrafficSigns-SHAPED data (same column layout as the reference's demo
  * CSVs — FIXTURES.md — with synthetic values): App-1 (filter+project)
  * and App-2 (filter+count), batch and streaming, plus the Go
  * encoding/csv parse-fidelity corner cases.
  */
class RainStormSpec extends GraftSpec {

  // columns: X,Y,OBJECTID,Sign_Type,Size_,Supplement,Sign_Post,Year,Category
  private val rows = Seq(
    "1.0,2.0,101,Stop,30,NONE,Punched Telespar,2009,Regulatory",
    "1.5,2.5,102,Yield,24,NONE,Punched Telespar,2010,Warning",
    "2.0,3.0,103,Speed Limit,36,NONE,Wood Post,2011,Regulatory",
    "2.5,3.5,104,\"No \"\"Parking\"\"\",18,NONE,Punched Telespar,2012,Regulatory",
    "3.0,4.0,105,Stop,30,NONE,Unpunched Telespar,2013,Warning")

  private def writeFixture(): String = {
    val dir = tmpDir("rainstorm-src")
    Files.write(Paths.get(dir, "signs.csv"),
      String.join("\n", rows: _*).getBytes, StandardOpenOption.CREATE)
    dir
  }

  test("App-1: filter(contains) then CSV-project (batch)") {
    val src = writeFixture()
    val out = RainStorm.run(spark, src, Ops.app1op1, Ops.app1op2,
      dest = None, numTasks = 2, pattern = "Stop")
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set("101" -> "Stop", "105" -> "Stop"))
  }

  test("App-2: filter(eq) to (Category,1) then running count (batch)") {
    val src = writeFixture()
    val out = RainStorm.run(spark, src, Ops.app2op1, Ops.app2op2,
      dest = None, numTasks = 2, pattern = "Punched Telespar")
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("Regulatory" -> "2", "Warning" -> "1"))
  }

  test("App-2 streaming equals batch") {
    val src = writeFixture()
    val ckpt = tmpDir("rainstorm-ckpt")
    val q = RainStorm.runStreaming(spark, src, Ops.app2op1, Ops.app2op2,
      "rainstorm_app2", ckpt, numTasks = 2, pattern = "Punched Telespar")
    q.awaitTermination()
    val got = spark.table("rainstorm_app2").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("Regulatory" -> "2", "Warning" -> "1"))
  }

  test("sink write produces <key,value> csv lines") {
    val src = writeFixture()
    val dest = tmpDir("rainstorm-dest") + "/out"
    RainStorm.run(spark, src, Ops.app1op1, Ops.app1op2,
      dest = Some(dest), numTasks = 2, pattern = "Yield")
    val lines = spark.read.textFile(dest).collect().toSet
    assert(lines === Set("102,Yield"))
  }

  test("splitCsv matches Go encoding/csv on quoted fields and errors") {
    assert(Ops.splitCsv("a,b,c").get.toSeq === Seq("a", "b", "c"))
    assert(Ops.splitCsv("\"a,b\",c").get.toSeq === Seq("a,b", "c"))
    assert(Ops.splitCsv("\"16\"\" X 42\"\"\",post").get.toSeq ===
      Seq("16\" X 42\"", "post"))
    assert(Ops.splitCsv("\"unterminated").isEmpty)   // parse error -> drop
    assert(Ops.splitCsv("a\"b,c").isEmpty)           // stray quote -> drop
    assert(Ops.splitCsv("a,,c").get.toSeq === Seq("a", "", "c"))
  }
}
