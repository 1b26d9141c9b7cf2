package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-explain")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.explain("formatted")
    spark.stop()
  }
}
