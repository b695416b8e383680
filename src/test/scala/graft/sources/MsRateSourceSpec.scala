package graft.sources

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The ms-rate DataSourceV2 source (MsRateSource.scala): millisecond
  * offset release, deterministic schedule, round-robin partition
  * layout. */
class MsRateSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("releases rows at sub-second granularity with scheduled timestamps") {
    val start = System.currentTimeMillis()
    val df = spark.readStream
      .format("ms-rate")
      .option("rowsPerSecond", 1000L)
      .option("numPartitions", 4)
      .option("startTimestampMs", start)
      .load()
    val q = df.writeStream.format("memory").queryName("msrate_t1")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // NOTE: never processAllAvailable() on a live wall-clock source —
      // new rows are always pending, it may not return. Sleep, stop,
      // then assert on what arrived (the memory table outlives the stop).
      Thread.sleep(2500)
      q.stop()
      val rows = spark.table("msrate_t1")
        .selectExpr("value", "cast(timestamp as long) * 1000 + " +
          "cast(date_format(timestamp, 'SSS') as long) as ts_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val n = rows.length
      // ~2.5s at 1000 rows/s; sub-second granularity means we see a
      // non-multiple-of-1000 count with high probability, and far more
      // than the 2 whole-second releases the built-in source would give
      assert(n > 1500, s"released only $n rows in ~2.5s at 1000 rows/s")
      // values are exactly 0..n-1 (no gaps, no dups across partitions)
      assert(rows.map(_._1).sorted.toSeq === (0L until n.toLong))
      // scheduled emit time of row i is start + i (1000 rows/s → 1 ms/row)
      rows.foreach { case (i, tsMs) =>
        assert(tsMs === start + i, s"row $i scheduled at $tsMs != ${start + i}")
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS msrate_t1")
    }
  }

  test("rows interleave round-robin across partitions") {
    val start = System.currentTimeMillis()
    val df = spark.readStream
      .format("ms-rate")
      .option("rowsPerSecond", 2000L)
      .option("numPartitions", 3)
      .option("startTimestampMs", start)
      .load()
    val withPart = df.select(
      org.apache.spark.sql.functions.spark_partition_id().as("pid"),
      org.apache.spark.sql.functions.col("value"))
    val q = withPart.writeStream.format("memory").queryName("msrate_t2")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      Thread.sleep(1200)
      q.stop()
      val rows = spark.table("msrate_t2").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(rows.nonEmpty)
      // within each micro-batch the reader maps value ≡ p (mod 3) to
      // partition p; spark_partition_id is stable per batch plan, so
      // every row's value mod 3 must be constant per partition id seen
      rows.groupBy(_._1).foreach { case (_, vs) =>
        assert(vs.map(_._2 % 3).distinct.length === 1,
          s"partition mixed residues: ${vs.take(5).mkString(",")}")
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS msrate_t2")
    }
  }
}
