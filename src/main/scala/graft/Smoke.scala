package graft

/** Local smoke: read every testdata table, print schema + count, run the
  * flagship entry. Not part of the driver contract.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-smoke")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, dir, n)
      println(s"== $n: ${df.count()} rows :: ${df.schema.simpleString}")
    }
    val e = SparkEntry.entry(spark)
    println(s"== entry rows: ${e.count()}")
    e.show(5, truncate = false)
    spark.stop()
  }
}
