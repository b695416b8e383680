package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.RateSentenceSource

/** Streaming → parquet lake ingestion with exactly-once across restarts:
  * the file sink's transaction log plus replayable source offsets must
  * produce each record exactly once even though the query is stopped and
  * restarted between micro-batches. */
class FileSinkExactlyOnceSpec extends AnyFunSuite {

  test("parquet file sink writes each batch exactly once across restarts") {
    val spark = SparkTestSession.spark
    val ckpt = Files.createTempDirectory("graft-fs-ckpt").toString
    val out = Files.createTempDirectory("graft-fs-out").toString
    val rate = 200; val runs = 3

    def runOnce(): Unit = {
      val sentences = RateSentenceSource.stream(
        spark, rate = rate, sentenceSize = 3, samplePeriod = 50,
        numPartitions = 2, dictSize = 100, startTimestampMs = 0L)
      val q = sentences.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.Once())
        .start()
      q.awaitTermination()
    }

    (1 to runs).foreach(_ => runOnce())

    val back = spark.read.parquet(out)
    // exactly runs×rate rows, no duplicates, no gaps: the deterministic
    // generator lets us reconstruct the exact expected multiset
    assert(back.count() === runs * rate)
    import spark.implicits._
    val sentencesRead = back.select("sentence").as[String].collect().sorted
    val dict = SentenceGen.dictionary(100)
    val expected = (0L until (runs * rate).toLong)
      .map(SentenceGen.sentenceAt(_, dict, 3)).sorted
    assert(sentencesRead.toSeq === expected)
  }
}
