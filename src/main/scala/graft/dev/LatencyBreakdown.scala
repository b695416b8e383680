package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.sources.RateSentenceSource
import graft.streaming.WordCountPipeline

/** Dev-only: run the latency-path query and dump per-batch duration
  * breakdowns (planning / getBatch / addBatch / state commit) from the
  * progress events. Usage: runMain graft.dev.LatencyBreakdown [parts]
  */
object LatencyBreakdown {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1 && args(1) == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sentences = RateSentenceSource.wallClockStream(
      spark, rate = 2000, sentenceSize = 100, samplePeriod = 200,
      numPartitions = spark.sparkContext.defaultParallelism)
    val counts = WordCountPipeline.statefulCounts(
      WordCountPipeline.tokenize(sentences))
    val q = counts.writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[graft.streaming.WordCount], _: Long) =>
          batch.filter(_.ts != -1L).collect(); ()
      }
      .option("checkpointLocation",
        graft.util.Scratch.dir("graft-latbd"))
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    Thread.sleep(20000)
    q.stop()
    q.recentProgress.takeRight(12).foreach { p =>
      val d = p.durationMs
      println(s"BREAKDOWN batch=${p.batchId} rows=${p.numInputRows} " +
        s"total=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
        s"getBatch=${d.get("getBatch")} plan=${d.get("queryPlanning")} " +
        s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")}")
    }
    spark.stop()
  }
}
