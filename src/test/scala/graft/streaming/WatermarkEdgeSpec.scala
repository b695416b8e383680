package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins Spark's windowed-aggregation finalization edge when the
  * watermark lands EXACTLY on a window boundary (the w09 oracle encodes
  * `window_end <= wm` — this spec is the evidence that the operator
  * agrees at the edge, where second-grained data can land via
  * max(ts) at exactly hh:10:00 with a 10-minute delay). */
class WatermarkEdgeSpec extends AnyFunSuite {

  test("a window whose end equals the watermark IS finalized in append mode") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one row in window [00:00, 01:00); a clock row at exactly 01:10:00
    // puts the watermark at 01:00:00 == the window's end
    val staged = Files.createTempDirectory("graft-wmedge").toString
    Seq((t("2024-01-01 00:30:00"), "a"), (t("2024-01-01 01:10:00"), "b"))
      .toDF("ts", "k").coalesce(1).write.mode("overwrite").parquet(staged)
    val agg = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("ts", org.apache.spark.sql.types.TimestampType).add("k",
          org.apache.spark.sql.types.StringType))
      .parquet(staged)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val qname = "wmedge_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    val finalized = spark.table(qname)
      .select(col("window.start").cast("string")).as[String].collect()
    // measured Spark 4.1 semantics: eviction predicate is
    // window_end <= watermark, so the boundary window IS emitted —
    // matching the `<=` the w09 oracle uses
    assert(finalized.contains("2024-01-01 00:00:00"),
      s"boundary window not finalized; got ${finalized.mkString(",")}")
    spark.sql(s"DROP TABLE IF EXISTS $qname")
  }
}
