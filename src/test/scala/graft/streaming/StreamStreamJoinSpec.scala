package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Stream-stream inner join with watermarks + time-interval condition
  * (SURVEY §2.2 joins row, streaming side): errors join purchases of the
  * same user within one hour after the purchase; both sides buffer in
  * the state store until the watermark expires them. */
class StreamStreamJoinSpec extends AnyFunSuite {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("errors join purchases within the interval, across batches") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msP = MemoryStream[(Timestamp, Long, Long)] // (p_ts, user, p_id)
    val msE = MemoryStream[(Timestamp, Long, Long)] // (e_ts, user, e_id)
    val purchases = msP.toDS().toDF("p_ts", "p_user", "p_id")
      .withWatermark("p_ts", "10 minutes")
    val errors = msE.toDS().toDF("e_ts", "e_user", "e_id")
      .withWatermark("e_ts", "10 minutes")
    val joined = purchases.join(errors,
      col("p_user") === col("e_user") &&
      col("e_ts") >= col("p_ts") &&
      col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("e_id"))
    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ssj").start()
    try {
      // batch 1: purchase for users 1 and 2
      msP.addData((ts(10, 0), 1L, 100L), (ts(10, 0), 2L, 200L))
      q.processAllAvailable()
      // batch 2 (other stream, later): one error in-window for user 1,
      // one out-of-window (2h later) for user 2, one for unknown user
      msE.addData((ts(10, 30), 1L, 11L), (ts(12, 0), 2L, 22L),
                  (ts(10, 15), 9L, 99L))
      q.processAllAvailable()
      // batch 3: a second purchase for user 2 puts error 22 in-window
      msP.addData((ts(11, 30), 2L, 201L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 11L), (201L, 22L)))
  }

  test("w13 left outer: nulls exactly for expired unmatched left rows") {
    // the gated replay's full expected surface, pinned row-exactly:
    // five inner pairs (incl. cross-batch state hits and the
    // late-but-admissible e150), null rows for the two purchases whose
    // windows closed unmatched (p100 mid-stream, p293 at drain), and
    // NOTHING for p700/p995 (windows still open at the final watermark)
    // or any right-side row
    val spark = SparkTestSession.spark
    val got = graft.SparkEntry
      .queries("w13_stream_stream_left_outer_join")(spark, SparkTestSession.sfDir)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got === Set(
      (191L, 911L), (200L, 220L), (200L, 230L), (400L, 410L), (105L, 150L),
      (100L, -1L), (293L, -1L)))
  }
}
