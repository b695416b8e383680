package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.RateSentenceSource

/** The kill_worker.sh analog (SURVEY §2.1 #8-9): stop the query between
  * micro-batches and restart from the same checkpoint; per-word totals
  * must continue exactly — proving state-store recovery + replayable
  * source offsets give exactly-once counts across failures. */
class CheckpointRecoverySpec extends AnyFunSuite {

  test("running counts survive query restarts exactly-once") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val rate = 100; val size = 5; val dictSize = 50; val runs = 3
    // merged last-write-wins totals across all update-mode emissions
    val merged = mutable.Map.empty[String, Long]

    def runOnce(): Unit = {
      val sentences = RateSentenceSource.stream(
        spark, rate = rate, sentenceSize = size, samplePeriod = 10,
        numPartitions = 2, dictSize = dictSize)
      val counts = WordCountPipeline.runningCounts(
        WordCountPipeline.tokenize(sentences))
      val q = counts.writeStream
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(String, Long)].collect()
            .foreach { case (w, c) => merged.synchronized { merged(w) = c } }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.Once()) // exactly one micro-batch, then stop
        .start()
      q.awaitTermination()
    }

    (1 to runs).foreach(_ => runOnce()) // 3 separate queries, one ckpt

    // offline oracle: the deterministic source emits exactly values
    // [0, runs*rate) regardless of restarts
    val dict = SentenceGen.dictionary(dictSize)
    val expected = (0L until (runs * rate).toLong)
      .flatMap(i => SentenceGen.sentenceAt(i, dict, size).split("\\W+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    // every word's last update equals its true cumulative count — state
    // was neither lost (undercount) nor replayed twice (overcount)
    assert(merged.toMap === expected)
  }
}
