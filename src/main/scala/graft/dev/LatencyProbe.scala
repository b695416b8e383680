package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only latency experiment: sweep the latency query's shuffle
  * partition count through Bench.latencyPercentiles on a quiet JVM.
  * Usage: runMain graft.dev.LatencyProbe [partitionCounts...]
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val partCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(32, 8, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    partCounts.foreach { p =>
      val (p50, p95) = graft.Bench.latencyPercentiles(spark, shufflePartitions = p)
      println(f"LATENCY parts=$p%-3d p50=$p50%6.0f ms  p95=$p95%6.0f ms")
      Thread.sleep(2000)
    }
    spark.stop()
  }
}
