package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.sources.RateSentenceSource

/** The reference job end-to-end (StatefulWordCount.java:36-98), Spark-
  * native: rate-controlled sentence source → repartition (the `rebalance`
  * analog, :80) → tokenizer → stateful running count → latency sink,
  * with checkpointing.
  *
  * CLI knobs mirror the reference's ParameterTool args (:39,50,60-67):
  *   --source-rate 12500  --sentence-size 100  --sample-period 1000
  *   --parallelism 4      --duration 60        --checkpoint-interval 30
  *   --skew-percent 0     --checkpoint-dir <path>
  *   --state-backend hdfs|rocksdb
  *   --changelog-checkpointing true|false   (rocksdb only)
  *   --count-output <dir>   (durable per-batch running counts — the
  *     observable-output mode the process-kill experiment asserts on)
  *
  * `--state-backend rocksdb` switches keyed state to the RocksDB state
  * store (off-heap, spill-to-disk) — the engine knob for keyed state
  * that exceeds executor heap, the analog of the reference's
  * filesystem/RocksDB backend choice (flink-conf.yaml.template:112-117).
  */
object StatefulWordCount {

  final case class Config(
      sourceRate: Int = 12500,
      sentenceSize: Int = 100,
      samplePeriod: Int = 1000,
      parallelism: Int = 4,
      durationSec: Int = 60,
      checkpointIntervalSec: Int = -1,
      skewPercent: Int = 0,
      checkpointDir: Option[String] = None,
      stateBackend: String = "hdfs",
      changelogCheckpointing: Boolean = false,
      countOutput: Option[String] = None)

  def parse(args: Array[String]): Config =
    args.sliding(2, 2).foldLeft(Config()) {
      case (c, Array("--source-rate", v))         => c.copy(sourceRate = v.toInt)
      case (c, Array("--sentence-size", v))       => c.copy(sentenceSize = v.toInt)
      case (c, Array("--sample-period", v))       => c.copy(samplePeriod = v.toInt)
      case (c, Array("--parallelism", v))         => c.copy(parallelism = v.toInt)
      case (c, Array("--duration", v))            => c.copy(durationSec = v.toInt)
      case (c, Array("--checkpoint-interval", v)) => c.copy(checkpointIntervalSec = v.toInt)
      case (c, Array("--skew-percent", v))        => c.copy(skewPercent = v.toInt)
      case (c, Array("--checkpoint-dir", v))      => c.copy(checkpointDir = Some(v))
      case (c, Array("--state-backend", v)) if v == "hdfs" || v == "rocksdb" =>
        c.copy(stateBackend = v)
      case (c, Array("--changelog-checkpointing", v)) =>
        c.copy(changelogCheckpointing = v.toBoolean)
      case (c, Array("--count-output", v))        => c.copy(countOutput = Some(v))
      case (c, other) =>
        sys.error(s"unknown argument: ${other.mkString(" ")}"); c
    }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${cfg.parallelism}]"))
      .appName("graft-stateful-wordcount")
      .config("spark.sql.shuffle.partitions", cfg.parallelism)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg) finally spark.stop()
  }

  /** provider class for the keyed state store backing the running counts */
  private[streaming] def providerClass(cfg: Config): String =
    if (cfg.stateBackend == "rocksdb")
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    else
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def run(spark: SparkSession, cfg: Config): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      providerClass(cfg))
    // RocksDB changelog checkpointing: commit per-batch write deltas to
    // the checkpoint instead of full SST snapshots — at 100 TB keyed
    // state this turns the per-batch durability cost from O(state) into
    // O(batch updates) and speeds recovery the same way (the RocksDB
    // analog of an incremental checkpoint). Off by default: the gated
    // recovery path measures the conservative full-snapshot shape.
    // Set UNCONDITIONALLY so a stale `true` left in a shared session by
    // an earlier run cannot override this run's `false`.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      (cfg.stateBackend == "rocksdb" && cfg.changelogCheckpointing).toString)
    val sentences = RateSentenceSource.stream(
      spark, rate = cfg.sourceRate, sentenceSize = cfg.sentenceSize,
      samplePeriod = cfg.samplePeriod, numPartitions = cfg.parallelism,
      skewPercent = cfg.skewPercent)
    // `rebalance` analog (reference :80): even redistribution pre-tokenize.
    // Usually redundant in Spark (the source already partitions evenly, and
    // the groupBy shuffle follows) — kept as the fidelity knob, see SURVEY
    // §2.1 #3.
    val tokens = WordCountPipeline.tokenize(
      sentences.repartition(cfg.parallelism))

    val ckpt = cfg.checkpointDir.getOrElse(
      graft.util.Scratch.dir("graft-wc-ckpt"))
    val query = cfg.countOutput match {
      case Some(out) =>
        // durable-counts mode, for the process-level failure experiment
        // (ChildJvmKillRecoverySpec — the kill_worker.sh analog): the
        // update-mode running totals land in one parquet dir PER BATCH,
        // overwritten on replay so a batch that died mid-write (the
        // `kill -9` case) is rewritten identically when its offset range
        // replays — idempotent, hence exactly-once observable from
        // outside the process. The rate-micro-batch source derives every
        // sentence purely from its row index, so any committed prefix
        // has a recomputable ground truth.
        WordCountPipeline.runningCounts(tokens).writeStream
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            batch.write.mode("overwrite").parquet(s"$out/batch=$id")
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .queryName("graft-stateful-wordcount")
          .start()
      case None =>
        val sink = new LatencySink(
          sinkId = scala.util.Random.nextInt(1 << 20),
          samplePeriod = cfg.samplePeriod)
        WordCountPipeline.statefulCounts(tokens).writeStream
          .outputMode("append")
          .foreachBatch((batch: org.apache.spark.sql.Dataset[WordCount], id: Long) =>
            sink(batch, id))
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .queryName("graft-stateful-wordcount")
          .start()
    }
    query.awaitTermination(cfg.durationSec * 1000L)
    query.stop()
  }
}
