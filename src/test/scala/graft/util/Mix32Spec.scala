package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The shared mixer's cross-surface contract: the Long form, the
  * Column form, and the mathematical definition must agree — three ops
  * (x15, w16, x20) and their oracles hang off this one function. */
class Mix32Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** the naive definition in BigInt (no overflow): the split multiply
    * must equal this wherever the naive Int64 form was defined, and
    * keep equaling it (mod-2^32 congruence) beyond */
  private def reference(i: Long): Long =
    ((BigInt(i) * Mix32.M1).mod(Mix32.MOD) * Mix32.M2 + 12345L)
      .mod(Mix32.MOD).toLong

  test("split multiply equals the mathematical definition across magnitudes") {
    val samples = Seq(0L, 1L, 7L, 65535L, 65536L, 123456789L,
      Int.MaxValue.toLong, 3400000000L, // past the naive Int64 overflow:
      4294967295L, 4294967296L, 16000000000L, Long.MaxValue / Mix32.M2)
    samples.foreach { i =>
      assert(Mix32.mix(i) == reference(i), s"mix($i)")
    }
  }

  test("Column form agrees with the Long form, including past 2^32") {
    import spark.implicits._
    val ids = Seq(0L, 99L, 65536L, 4294967295L, 4294967296L, 16000000000L)
    val got = ids.toDF("i")
      .select(col("i"), Mix32.hash(col("i")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == Mix32.mix(i), s"hash($i)"))
  }

  test("bijective over a consecutive window below 2^32") {
    val window = (1000000L until 1010000L).map(Mix32.mix)
    assert(window.distinct.size == window.size,
      "odd-constant mixer must not collide inside Z_2^32")
  }

  test("keys 2^32 apart collide by design (the fold x15's witness avoids)") {
    assert(Mix32.mix(42L) == Mix32.mix(42L + Mix32.MOD))
  }
}
