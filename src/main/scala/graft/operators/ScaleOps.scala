package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.{QuerySpec, Tables}

/** Scale-technique operators: each demonstrates a 100 TB pattern while
  * remaining exactly oracle-checkable.
  *
  *  - x01 salted two-phase aggregation: the skew-mitigation pattern
  *    (hot keys split across `SALT` sub-keys in phase 1, re-merged in
  *    phase 2). Result is provably identical to the direct groupBy —
  *    the oracle is literally q14's SQL.
  *  - x02 sessionization via window functions (gap-based), the batch
  *    ground truth for the streaming session_window op (w03).
  *  - x03/x04 CSV / JSON-lines sink→source roundtrips: the engine's
  *    non-parquet format surface, checked by aggregating the roundtrip
  *    against the parquet-direct oracle.
  */
object ScaleOps {

  // ---------------------------------------------------------------------
  // x01 — salted two-phase word count (skew-resistant aggregation)
  // ---------------------------------------------------------------------
  private val SALT = 16

  private def x01(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\W+")).as("word"))
      .where(length(col("word")) > 0)
      // phase 1: aggregate on (word, salt) — a hot word spreads over
      // SALT reducers instead of melting one
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()), lit(SALT)))
      .groupBy(col("word"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      // phase 2: merge partials per word (tiny input: ≤ SALT rows/word)
      .groupBy(col("word"))
      .agg(sum(col("partial")).as("cnt"))

  // ---------------------------------------------------------------------
  // x02 — gap-based sessionization over the events stream (batch truth)
  // ---------------------------------------------------------------------
  private val GAP_MIN = 30

  private def x02(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // exact-µs gap arithmetic (ntz → epoch micros; session tz is UTC)
    def epochUs(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast(TimestampType))
    val prevTs = lag(col("ts"), 1).over(w)
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("first_flag",
        when(prevTs.isNull, 1L)
          .when(epochUs(col("ts")) - epochUs(prevTs) > GAP_MIN * 60L * 1000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("first_flag")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }

  /** shared sessionization CTE (also the oracle base for streaming w03) */
  private[operators] val sessionCte =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${GAP_MIN * 60L * 1000000L} THEN 1
       |         ELSE 0 END AS first_flag
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    SUM(first_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged),
       |agg AS (
       |  SELECT user_id, session_id, COUNT(*) AS n_events,
       |    min(ts) AS session_start, max(ts) AS session_end
       |  FROM sess GROUP BY user_id, session_id)""".stripMargin

  private val x02Sql =
    s"""$sessionCte
       |SELECT user_id, session_id, n_events, session_start, session_end
       |FROM agg""".stripMargin

  private[operators] val gapMinutes = GAP_MIN

  // ---------------------------------------------------------------------
  // x03 / x04 — CSV and JSON-lines sink→source roundtrips
  // ---------------------------------------------------------------------
  private def ordersAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderstatus"), year(col("o_orderdate")).cast(IntegerType).as("yr"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast(DecimalType(18, 2)))
             .cast(DoubleType).as("total"))

  private val roundtripSql =
    """SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS yr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2""".stripMargin

  private def x03(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val o = Tables.orders(spark, dir)
    o.write.mode("overwrite")
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(tmp)
    val back = spark.read
      .schema(o.schema) // schema-on-read: CSV carries no types
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(tmp)
    ordersAgg(back)
  }

  private def x04(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-json").toString
    val o = Tables.orders(spark, dir)
    o.write.mode("overwrite")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(tmp)
    val back = spark.read
      .schema(o.schema)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(tmp)
    ordersAgg(back)
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("x01_salted_wordcount", x01, Some(Relational.q14Sql)),
    QuerySpec("x02_sessionize", x02, Some(x02Sql)),
    QuerySpec("x03_csv_roundtrip", x03, Some(roundtripSql)),
    QuerySpec("x04_json_roundtrip", x04, Some(roundtripSql)))
}
