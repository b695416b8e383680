package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("graft_dot is SQL-callable after runtime registration") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(v === 32.0)
  }

  test("graft_simhash32 in SQL equals the Column-API expression") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash32(array('alpha', 'beta', 'gamma')) AS s")
      .head.getLong(0)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftglue.ColumnBridge
    import spark.implicits._
    val viaColumn = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(ColumnBridge.column(
        graft.functions.expressions.SimHash32(
          ColumnBridge.expression(col("toks")))))
      .head.getLong(0)
    assert(viaSql === viaColumn)
    assert(viaSql >= 0L && viaSql < (1L << 32))
  }
}
