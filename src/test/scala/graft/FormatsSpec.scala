package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Source/sink breadth: the engine reads and writes every mainstream
  * columnar/row format, and partitioned layouts prune at the scan — the
  * property that turns a 100 TB table into a 100 GB read.
  */
class FormatsSpec extends GraftSpec {

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("parquet/orc/csv/json roundtrips preserve data") {
    val base = canon(li)
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      val dir = tmpDir(s"fmt-$fmt")
      li.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
      val back = spark.read.option("header", "true")
        .schema(li.schema).format(fmt).load(dir)
      assert(canon(back) === base, s"roundtrip mismatch for $fmt")
    }
  }

  test("hive-partitioned write prunes partitions at the scan") {
    val dir = tmpDir("fmt-part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the partition filter reached the scan: only the R directory is read
    assert(scans.head.partitionFilters.nonEmpty,
      "expected a partition filter on the scan")
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(q.count() === expected)
  }
}
