package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Event-time watermark semantics (SURVEY §2.2 streaming-windows row):
  * append-mode windows finalize once the watermark passes their end, and
  * records older than the watermark are dropped as late data. */
class WatermarkSpec extends AnyFunSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append-mode windowed agg finalizes on watermark and drops late data") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val agg = ms.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      // group on the window STRUCT — extracting .start here would sever
      // the watermark association and reject append mode
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum(col("v")).as("total"))
      .select(col("window.start").as("w"), col("total"))
    val q = agg.writeStream
      .outputMode("append").format("memory").queryName("wm_agg").start()
    try {
      // batch 1: two events in the 10:00 window, one in 10:10
      ms.addData((ts(1), 1L), (ts(5), 10L), (ts(11), 100L))
      q.processAllAvailable()
      // batch 2: jump event time to 11:00 → watermark 10:50 → the 10:00
      // and 10:10 windows close and emit
      ms.addData((ts(0 + 60), 1000L))
      q.processAllAvailable()
      // batch 3: a late event for the long-closed 10:00 window → dropped
      ms.addData((ts(2), 77L))
      q.processAllAvailable()
      // batch 4: advance far enough to also close the 11:00 window
      ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 1L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("wm_agg")
      .select(col("w").cast("string"), col("total"))
      .as[(String, Long)].collect().toMap
    assert(rows("2024-01-01 10:00:00") === 11L) // late 77 NOT included
    assert(rows("2024-01-01 10:10:00") === 100L)
    assert(rows("2024-01-01 11:00:00") === 1000L)
  }
}
