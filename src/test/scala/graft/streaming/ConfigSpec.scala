package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("parse maps every reference CLI knob") {
    val cfg = StatefulWordCount.parse(Array(
      "--source-rate", "9999", "--sentence-size", "42",
      "--sample-period", "77", "--parallelism", "8",
      "--duration", "120", "--checkpoint-interval", "30",
      "--skew-percent", "15", "--checkpoint-dir", "/tmp/ck"))
    assert(cfg === StatefulWordCount.Config(
      sourceRate = 9999, sentenceSize = 42, samplePeriod = 77,
      parallelism = 8, durationSec = 120, checkpointIntervalSec = 30,
      skewPercent = 15, checkpointDir = Some("/tmp/ck")))
  }

  test("defaults match the reference operating point (BASELINE.md)") {
    val cfg = StatefulWordCount.parse(Array.empty)
    assert(cfg.sourceRate === 12500)
    assert(cfg.sentenceSize === 100)
    assert(cfg.samplePeriod === 1000)
    assert(cfg.durationSec === 60)
    assert(cfg.checkpointIntervalSec === -1)
  }

  test("unknown arguments are rejected") {
    assertThrows[RuntimeException] {
      StatefulWordCount.parse(Array("--bogus", "1"))
    }
  }

  test("state-backend knob selects the RocksDB provider") {
    assert(StatefulWordCount.parse(Array.empty).stateBackend === "hdfs")
    val cfg = StatefulWordCount.parse(Array("--state-backend", "rocksdb"))
    assert(cfg.stateBackend === "rocksdb")
    assert(StatefulWordCount.providerClass(cfg)
      === "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    assert(StatefulWordCount.providerClass(StatefulWordCount.Config())
      .contains("HDFSBackedStateStoreProvider"))
    assertThrows[RuntimeException] {
      StatefulWordCount.parse(Array("--state-backend", "bogus"))
    }
  }

  test("changelog-checkpointing knob parses and defaults off") {
    assert(!StatefulWordCount.parse(Array.empty).changelogCheckpointing)
    assert(StatefulWordCount.parse(Array(
      "--state-backend", "rocksdb", "--changelog-checkpointing", "true"))
      .changelogCheckpointing)
  }
}
