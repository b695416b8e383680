package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate-aggregate (sketch) surface — at 100 TB an exact
  * count-distinct shuffles every distinct key and an exact percentile
  * buffers every value, while HLL++ / KLL-style sketches keep
  * fixed-size, mergeable state. The gate can't hash-match sketches
  * against DuckDB (different algorithms), so their accuracy contracts
  * are pinned here instead, against the exact operators the engine
  * also ships (q11/q17).
  */
class SketchSpec extends AnyFunSuite {

  // shared sf0.001 fixture (the accuracy bounds hold there too) — the
  // ad-hoc sf0.01 path this suite used was a 10× fixture in the unit
  // path and a second path constant to drift (round-5 advisor)
  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private lazy val tokens =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) > 0)

  test("approx_count_distinct (HLL++) tracks exact within 3x its rsd") {
    val exact = tokens.select(count_distinct(col("w"))).head.getLong(0)
    val approx = tokens
      .select(approx_count_distinct(col("w"), 0.02)).head.getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within accuracy bound of the exact rank") {
    val df = Tables.lineitem(spark, sfDir)
    val exact = df.select(
      expr("percentile(l_extendedprice, 0.9)")).head.getDouble(0)
    val approx = df.select(
      expr("approx_percentile(l_extendedprice, 0.9, 1000)")).head.getDouble(0)
    // with accuracy=1000 the rank error is <= 1/1000 of rows; translate
    // to a loose value-space tolerance on this distribution
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx=$approx exact=$exact")
  }
}
