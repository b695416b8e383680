package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LatencySinkSpec extends AnyFunSuite {

  test("writes reference-shaped CSV rows for stamped records only") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val csv = Files.createTempDirectory("graft-lat").resolve("lat.csv").toString
    val sink = new LatencySink(sinkId = 7, samplePeriod = 10, csvPath = Some(csv))
    val batch = Seq(
      WordCount(1000L, "a", 1L, 0),
      WordCount(-1L, "b", 2L, 0), // unstamped: must not be logged
      WordCount(2000L, "c", 3L, 1)).toDS()
    sink(batch, 0L)
    val lines = Files.readAllLines(Paths.get(csv))
    assert(lines.size === 2)
    // sink_id,timestamp,cur_time,latency with latency = cur_time - timestamp
    lines.forEach { l =>
      val Array(id, ts, cur, lat) = l.split(",")
      assert(id === "7")
      assert(lat.toLong === cur.toLong - ts.toLong)
    }
  }
}
