package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only throughput experiment: sweep micro-batch sizes (and state
  * backends) through Bench.streamWordsPerSec to find the saturation
  * operating point. Usage: runMain graft.dev.ThroughputProbe [sizes...]
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50000, 100000, 200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      val wps = graft.Bench.streamWordsPerSec(spark, rowsPerBatch = n)
      println(f"THROUGHPUT rowsPerBatch=$n%-7d $wps%12.0f words/s")
    }
    spark.stop()
  }
}
