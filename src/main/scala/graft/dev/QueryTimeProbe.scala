package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual gate queries at bench parallelism.
  * Usage: runMain graft.dev.QueryTimeProbe <sfDir> <names...>
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("w08_stream_stream_join", "w10_stream_stream_watermarked_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warmup
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"QUERYTIME $n%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $rows rows")
    }
    spark.stop()
  }
}
