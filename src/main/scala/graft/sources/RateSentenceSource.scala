package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.streaming.{Sentence, SentenceGen}

/** Rate-controlled synthetic sentence source — the Spark-native analog of
  * the reference's RateControlledSourceFunction.java:11-95.
  *
  * Built on the replayable `rate-micro-batch` source (deterministic rows
  * per batch, deterministic timestamps), so source checkpoint/restore
  * (reference :102-123) is implicit: on recovery Spark replans the same
  * offset range and `SentenceGen.sentenceAt` regenerates identical
  * records — exactly-once without custom snapshot state.
  *
  * Semantics carried over:
  *  - pacing: `rowsPerBatch = rate`, one batch per second of scheduled
  *    time (`advanceMillisPerBatch = 1000`) ≙ `rate` sentences/s
  *    (reference :67,75-86 sleeps to the same schedule)
  *  - sampled-timestamp channel: every samplePeriod-th record carries its
  *    scheduled emission time, others -1 (reference :73-75; SURVEY §1.3)
  *  - skew knob: hot-key sentences with probability skewPercent%
  *    (RandomSentenceGenerator.java:47-53)
  *  - sourceId ≙ parallel subtask index (reference :13)
  */
object RateSentenceSource {

  def stream(
      spark: SparkSession,
      rate: Int,
      sentenceSize: Int = 100,
      samplePeriod: Int = 1000,
      numPartitions: Int = 4,
      skewPercent: Int = 0,
      dictSize: Int = SentenceGen.DefaultDictSize,
      startTimestampMs: Long = -1L): Dataset[Sentence] = {
    import spark.implicits._
    // scheduled-time base defaults to job start, like the reference's
    // pacing clock (RateControlledSourceFunction.java:66 startTime = now)
    val startMs =
      if (startTimestampMs >= 0) startTimestampMs else System.currentTimeMillis()
    // dictionary built once on the driver, broadcast to executors
    val dictBc = spark.sparkContext.broadcast(SentenceGen.dictionary(dictSize))
    val nPart = numPartitions
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rate.toLong)
      .option("numPartitions", numPartitions)
      .option("startTimestamp", startMs)
      .option("advanceMillisPerBatch", 1000L)
      .load()
      .as[(java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val dict = dictBc.value
        it.map { case (scheduled, idx) =>
          Sentence(
            ts = if (idx % samplePeriod == 0) scheduled.getTime else -1L,
            sentence = SentenceGen.sentenceAt(idx, dict, sentenceSize, skewPercent),
            sourceId = (idx % nPart).toInt)
        }
      }
  }

  /** Wall-clock-paced variant on the engine's `ms-rate` source (see
    * MsRateSource.scala): records are stamped with their scheduled emit
    * time and the source cannot run ahead of real time — the reference's
    * sleep-to-schedule pacing semantics (RateControlledSourceFunction
    * .java:75-86). ms-rate releases rows at millisecond granularity, so
    * sink-side latency measures trigger-wait + pipeline delay (the
    * built-in `rate` source's whole-second offsets would add up to 1 s
    * of release delay per record). Use for latency measurement; the
    * deterministic `stream` above is for throughput and exactly-once
    * tests. */
  def wallClockStream(
      spark: SparkSession,
      rate: Int,
      sentenceSize: Int = 100,
      samplePeriod: Int = 1000,
      numPartitions: Int = 4,
      skewPercent: Int = 0,
      dictSize: Int = SentenceGen.DefaultDictSize): Dataset[Sentence] = {
    import spark.implicits._
    val dictBc = spark.sparkContext.broadcast(SentenceGen.dictionary(dictSize))
    val nPart = numPartitions
    spark.readStream
      .format("ms-rate")
      .option("rowsPerSecond", rate.toLong)
      .option("numPartitions", numPartitions)
      .load()
      .as[(java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val dict = dictBc.value
        it.map { case (emitted, idx) =>
          Sentence(
            ts = if (idx % samplePeriod == 0) emitted.getTime else -1L,
            sentence = SentenceGen.sentenceAt(idx, dict, sentenceSize, skewPercent),
            sourceId = (idx % nPart).toInt)
        }
      }
  }
}
