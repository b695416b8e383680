package graft

import org.apache.spark.sql.SparkSession

/** Dev-only schema/behavior probe; not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(2, false)
    } catch { case e: Throwable => println("EVENTS FAIL: " + e.getMessage.take(300)) }
    import org.apache.spark.sql.functions._
    try {
      li.filter(col("l_shipdate") <= lit("1995-01-01")).show(2)
    } catch { case e: Throwable => println("TS FILTER FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
