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

  test("graft_simhash64 matches a hand-computed signature") {
    GraftFunctions.register(spark)
    // independent Scala-side computation of the same definition: token
    // hash = first 8 md5 bytes big-endian, bit b set iff vote sum > 0
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
      (0 until 64).foreach(b => votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
    }
    val expected = (0 until 64).foldLeft(0L)((acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc)
    val viaSql = spark.sql(
      s"SELECT graft_simhash64(array(${toks.map("'" + _ + "'").mkString(",")})) AS s")
      .head.getLong(0)
    assert(viaSql === expected)
  }

  test("simhash64 hamming distance is small for near-identical token sets") {
    GraftFunctions.register(spark)
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.dropRight(1) :+ "tok_changed"
    def sig(ts: Seq[String]): Long = spark.sql(
      s"SELECT graft_simhash64(array(${ts.map("'" + _ + "'").mkString(",")}))")
      .head.getLong(0)
    val h = java.lang.Long.bitCount(sig(base) ^ sig(near))
    val hFar = java.lang.Long.bitCount(
      sig(base) ^ sig((1 to 60).map(i => s"other$i")))
    assert(h < hFar, s"near hamming $h should undercut far hamming $hFar")
  }
}
