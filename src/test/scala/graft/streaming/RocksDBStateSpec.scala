package graft.streaming

import java.util.UUID

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Smoke-test the `--state-backend rocksdb` knob (SURVEY §7.4: keyed
  * state beyond executor heap): the stateful word count must produce
  * identical results under the RocksDB state store provider. */
class RocksDBStateSpec extends AnyFunSuite {

  test("stateful word count is correct under the RocksDB state store") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cfg = StatefulWordCount.parse(Array("--state-backend", "rocksdb"))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StatefulWordCount.providerClass(cfg))
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("text"))
      val staged = java.nio.file.Files.createTempDirectory("graft-rocks").toString
      docs.repartition(3).write.mode("overwrite").parquet(staged)
      val counts = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .select(explode(split(col("text"), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).count()
      val qname = "rocks_" + UUID.randomUUID().toString.replace("-", "")
      val q = counts.writeStream
        .outputMode("complete").format("memory").queryName(qname).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(qname).as[(String, Long)].collect().toMap
      val expected = docs
        .select(explode(split(col("text"), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).count()
        .as[(String, Long)].collect().toMap
      assert(got === expected)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("changelog checkpointing is active and counts stay correct") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val changelogConf =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevLog = spark.conf.getOption(changelogConf)
    val cfg = StatefulWordCount.parse(Array(
      "--state-backend", "rocksdb", "--changelog-checkpointing", "true"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StatefulWordCount.providerClass(cfg))
    spark.conf.set(changelogConf, cfg.changelogCheckpointing.toString)
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("text"))
      val staged = java.nio.file.Files.createTempDirectory("graft-rockslog").toString
      docs.repartition(3).write.mode("overwrite").parquet(staged)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rockslog-ck").toString
      val counts = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .select(explode(split(col("text"), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).count()
      val qname = "rockslog_" + UUID.randomUUID().toString.replace("-", "")
      val q = counts.writeStream
        .outputMode("complete").format("memory").queryName(qname)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(qname).as[(String, Long)].collect().toMap
      val expected = docs
        .select(explode(split(col("text"), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).count()
        .as[(String, Long)].collect().toMap
      assert(got === expected)
      // the knob must actually bite: with changelog checkpointing the
      // per-batch commit writes N.changelog delta files into the state
      // checkpoint instead of only full .zip snapshots
      val changelogs = java.nio.file.Files
        .walk(java.nio.file.Paths.get(ckpt, "state"))
        .filter(p => p.getFileName.toString.endsWith(".changelog"))
        .count()
      assert(changelogs > 0, "no .changelog files — knob silently ignored")
    } finally {
      prevProv match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevLog match {
        case Some(v) => spark.conf.set(changelogConf, v)
        case None    => spark.conf.unset(changelogConf)
      }
    }
  }
}
