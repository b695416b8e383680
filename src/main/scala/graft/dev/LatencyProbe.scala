package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only latency experiment: sweep the latency query's regime
  * (shuffle partitions / source rate / trigger) through
  * Bench.latencyPercentiles on a quiet JVM.
  * Usage: runMain graft.dev.LatencyProbe [parts:rate:triggerMs ...]
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val regimes = if (args.nonEmpty) args.toSeq.map { a =>
      val p = a.split(":"); (p(0).toInt, p(1).toInt, p(2).toInt)
    } else Seq((8, 2000, 100), (8, 2000, 250), (8, 1000, 100))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    regimes.foreach { case (parts, rate, trig) =>
      val s = graft.Bench.latencyPercentiles(
        spark, shufflePartitions = parts, rate = rate, triggerMs = trig)
      println(f"LATENCY parts=$parts%-3d rate=$rate%-5d trig=${trig}%-4d " +
        f"p50=${s.p50}%6.0f ms  p95=${s.p95}%6.0f ms  " +
        f"batch=${s.meanBatchMs}%5.0f ms  backlog=${s.backlogBatches}%d")
      Thread.sleep(2000)
    }
    spark.stop()
  }
}
