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

  test("cosine is symmetric and 1.0 on itself") {
    import spark.implicits._
    val v = Array.fill(16)(0.5f)
    val df = Seq((v, v)).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
