package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property x12's layout exists for: after Morton-interleaved
  * clustering, EVERY file covers a small rectangle of the
  * (l_orderkey, l_partkey) key space — so min/max stats prune on BOTH
  * dimensions — whereas a single-column sort leaves the secondary
  * dimension's per-file span at full width and prunes nothing there.
  * The assertion is made at file granularity (a written file's stats
  * bound its row groups' stats), against a single-dim-sorted copy of
  * the SAME rows written the same way.
  */
class ZOrderSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("z-ordered files prune a secondary-dim slice a single-dim sort cannot") {
    val spark = SparkTestSession.spark
    val (zPath, _, pkT) = operators.ScaleOps.x12Stage(spark, sfDir)

    // comparison layout: same rows, same file count, sorted on the
    // PRIMARY dim only — the layout you'd have without z-ordering
    val linPath = util.Scratch.dir("graft-zorder-lin")
    spark.read.parquet(zPath)
      .repartitionByRange(32, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)

    // per-file partkey span; a file survives the slice l_partkey <= pkT
    // iff its min does (stats pruning is exactly this min/max test)
    def candidates(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_partkey")).as("lo"))
        .collect()
      (stats.count(_.getAs[Long]("lo") <= pkT).toLong, stats.length.toLong)
    }
    val (zCand, zFiles) = candidates(zPath)
    val (linCand, linFiles) = candidates(linPath)

    // sanity: both layouts hold the same corpus in a comparable shape
    assert(spark.read.parquet(zPath).count() ===
           Tables.lineitem(spark, sfDir).count())
    assert(zFiles > 8 && linFiles > 8, s"want many files, got $zFiles/$linFiles")

    // the single-dim sort cannot prune the secondary dim: every file
    // spans (nearly) the full partkey range, so ~all files survive
    assert(linCand >= linFiles - 1,
      s"expected the linear layout unprunable on partkey, got $linCand/$linFiles")
    // the z-order layout must prune at least half the files on the
    // same slice (a 10% slice of one dim intersects only the z-curve
    // cells whose partkey quadrant is low)
    assert(zCand * 2 <= zFiles,
      s"z-layout pruned too little: $zCand of $zFiles files survive pkT=$pkT")
  }
}
