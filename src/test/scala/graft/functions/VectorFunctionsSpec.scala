package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VectorFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("codegen dot product is bit-identical to the HOF reference fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      // exact equality on purpose: same left-to-right double fold
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("scaledSqDist is bit-identical to the exploded round()+sum shape") {
    // the k-means family's determinism contract: the one-loop kernel
    // must reproduce round((x−c)²·s) per element EXACTLY (BigDecimal
    // HALF_UP — Spark round's double path), summed as long
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = Seq.tabulate(50)(i => (i.toLong,
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "a", "c")
    val fast = df.select(col("id"),
      VectorFunctions.scaledSqDist(col("a"), col("c"), 1e8).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df
      .select(col("id"), posexplode(col("a")).as(Seq("pos", "xf")),
        col("c"))
      .select(col("id"),
        (col("xf").cast("double") - element_at(col("c"), col("pos") + 1))
          .as("d0"))
      .groupBy(col("id"))
      .agg(sum(round(col("d0") * col("d0") * lit(1e8)).cast("long")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === ref)
  }

  test("cosine is symmetric and 1.0 on itself") {
    import spark.implicits._
    val v = Array.fill(16)(0.5f)
    val df = Seq((v, v)).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("scaledSqDist fails SOFT on non-finite inputs (no exception)") {
    // round-7 advisor: BigDecimal.valueOf(NaN) threw NumberFormatException
    // mid-job. Under Spark 4's default ANSI casts the exploded
    // round()+cast shape also throws (CAST_OVERFLOW) — the kernel
    // instead keeps round()'s pass-through then SATURATES like the
    // legacy cast: +Inf → Long.MaxValue (an "infinitely far" candidate
    // can never win an argmin), NaN → 0 contribution. One malformed
    // embedding must not kill a 100-TB clustering job.
    import spark.implicits._
    val df = Seq(
      (1L, Array(Double.NaN, 1.0), Array(0.0, 0.0)),
      (2L, Array(Double.MaxValue, 0.0), Array(-Double.MaxValue, 0.0)))
      .toDF("id", "a", "c")
    val fast = df.select(col("id"),
      VectorFunctions.scaledSqDist(col("a"), col("c"), 1e8).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NaN element contributes 0; the remaining finite element still counts
    assert(fast(1L) === 1e8.toLong)
    // overflow saturates: Long.MaxValue + a finite element's 0 (capped sum)
    assert(fast(2L) === Long.MaxValue)
  }

  test("scaledSqDist fails loudly on length-mismatched inputs") {
    // it feeds argmin assignment: silently truncating to the shorter
    // array would produce a plausible wrong cluster, not an error
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "c")
    val e = intercept[Exception] {
      df.select(VectorFunctions.scaledSqDist(col("a"), col("c"), 1e8))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(causes)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("length mismatch"))))
  }
}
