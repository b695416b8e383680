package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The Ben-Haim/Tom-Tov streaming histogram (w25) beyond its gated
  * exact regime: a STARVED capacity forces the closest-bin merge
  * path, where the sketch's invariants must hold — bounded bins per
  * shard, total mass preserved exactly, centroids inside the data
  * range, quantiles monotone — and the exact answer recovered the
  * moment capacity covers the value cardinality. */
class QuantileSketchSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  /** exact token-length histogram off the same tokenization */
  private def exactHist: Map[Long, Long] =
    SparkEntry.queries("q14_wordcount")(spark, sfDir)
      .select(length(col("word")).cast("long").as("len"),
              col("cnt"))
      .groupBy(col("len")).agg(sum(col("cnt")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("starved capacity: bins bounded, mass preserved, centroids in range") {
    // ~15 distinct lengths into capacity 4 over 1 shard: the merge
    // branch runs constantly — the degraded regime a production
    // value distribution lives in
    val finals = StreamingOps.w25Probe(spark, sfDir, capacity = 4,
        shards = 1)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(finals.nonEmpty && finals.length <= 4,
      s"bins must stay within capacity: ${finals.length}")
    val exact = exactHist
    assert(finals.map(_._2).sum == exact.values.sum,
      "the BT merge preserves total mass exactly")
    val (lo, hi) = (exact.keys.min.toDouble, exact.keys.max.toDouble)
    finals.foreach { case (c, n) =>
      assert(c >= lo && c <= hi && n > 0,
        s"centroid $c (n=$n) must sit inside the data range [$lo, $hi]")
    }
  }

  test("ample capacity reproduces the exact discrete quantiles (the gated regime)") {
    val got = SparkEntry.queries("w25_stream_quantile_sketch")(
        spark, sfDir)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // the same ⌈q·N⌉ rule, computed directly off the exact histogram
    val exact = exactHist.toSeq.sortBy(_._1)
    val tot = exact.map(_._2).sum
    val want = Seq(0.25, 0.5, 0.75, 0.9).map { q =>
      val need = math.ceil(q * tot).toLong
      var cum = 0L
      q -> exact.collectFirst {
        case (v, n) if { cum += n; cum >= need } => v
      }.get
    }.toMap
    assert(got == want, s"exact regime must equal the batch quantiles " +
      s"(got $got, want $want)")
    // quantiles are monotone in q by construction — pin it anyway
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted)
  }
}
