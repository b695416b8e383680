package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the flagship reference job end-to-end through its real entry
  * path — parse(CLI args) → run(spark, cfg) — rather than through the
  * pipeline pieces the other specs exercise. Pins that the wiring
  * (source rate/size knobs → rebalance → tokenize → stateful count →
  * latency sink, with checkpointing) actually starts, commits batches,
  * and shuts down within the configured duration. */
class StatefulWordCountJobSpec extends AnyFunSuite {

  test("flagship job runs from CLI args, commits batches, and stops") {
    val spark = SparkTestSession.spark
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val ckpt = Files.createTempDirectory("graft-job-ckpt").toString
    val cfg = StatefulWordCount.parse(Array(
      "--source-rate", "2000", "--sentence-size", "10",
      "--sample-period", "100", "--parallelism", "2",
      "--duration", "5", "--checkpoint-dir", ckpt))
    try StatefulWordCount.run(spark, cfg)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // at a 1 s trigger a 5 s run must have planned and committed at
    // least the first micro-batch; commits/0 is the durable proof the
    // full source→state→sink path executed exactly-once machinery
    assert(Files.exists(Paths.get(ckpt, "commits", "0")),
      "no micro-batch commit in the job checkpoint")
  }
}
