package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The Misra–Gries streaming sketch (w24) beyond its gated exact
  * regime: a STARVED capacity forces the decrement path, where the
  * classic guarantees must hold — bounded state per shard, no tracked
  * count above the exact count, and the exact answer recovered the
  * moment capacity covers the vocabulary. */
class HeavyHittersSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def exactCounts: Map[String, Long] =
    SparkEntry.queries("q14_wordcount")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("starved capacity: state stays bounded and never overcounts") {
    // ~31 distinct words into capacity 4 over 1 shard: the decrement
    // branch runs constantly — the degraded regime the 100 TB
    // vocabulary lives in
    val finals = StreamingOps.w24Probe(spark, sfDir, capacity = 4,
        shards = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(finals.nonEmpty && finals.length <= 4,
      s"state must stay within capacity: ${finals.length} tracked")
    val exact = exactCounts
    finals.foreach { case (_, w, n) =>
      assert(n <= exact(w),
        s"Misra-Gries never overcounts: $w tracked $n > exact ${exact(w)}")
    }
  }

  test("ample capacity reproduces the exact batch top-k (the gated regime)") {
    val got = SparkEntry.queries("w24_stream_heavy_hitters")(spark, sfDir)
      .select(col("word"), col("n_occurrences"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val want = exactCounts.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(10).toSet
    assert(got == want, "exact regime must equal the batch top-10")
  }
}
