package graft
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-schema")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val tz = fn(spark, "/root/testdata/sf0.001").schema.fields
          .filter(_.dataType.typeName == "timestamp").map(_.name)
        if (tz.nonEmpty) println(s"LTZ: $name -> ${tz.mkString(",")}")
      } catch { case e: Throwable => println(s"ERR: $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
