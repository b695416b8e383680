package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.{GraftFunctions, QuerySpec, Tables}

/** Relational operator surface: scans, filters/projections, joins
  * (shuffle/broadcast/semi/anti), aggregations (hash, distinct, rollup),
  * window functions, top-k, set ops, scalar functions, JSON extraction and
  * event-time windows.
  *
  * The reference (see SURVEY.md §2.2) contains none of these beyond a
  * tokenizer filter — this breadth comes from Spark built-ins so Catalyst
  * gets full visibility (pushdown, pruning, join selection, AQE).
  *
  * Cross-engine determinism notes (DuckDB oracle):
  *  - all test-data doubles carry ≤2 decimals, so `CAST(x AS DECIMAL(p,2))`
  *    is exact; SUMs are computed in decimal (associative, order-independent)
  *    and only the final value is cast back to DOUBLE. Summing raw doubles
  *    would be partial-aggregation-order dependent and hash-unstable.
  *  - window orderings always include a unique tiebreak column.
  *  - timestamps: parquet `timestamp[ms] (isAdjustedToUTC=false)` reads as
  *    TIMESTAMP_NTZ in Spark 4 and naive TIMESTAMP in DuckDB — same wall
  *    clock, no zone math on either side.
  */
object Relational {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  private val oneD  = lit(1).cast(DecimalType(3, 2))
  /** decimal-exact SUM of a ≤2-decimal double, surfaced as DOUBLE */
  private def dsum(c: Column): Column = sum(dec(c, 18, 2)).cast(DoubleType)

  // ---------------------------------------------------------------------
  // q01 — pricing summary (hash aggregation, partial+final, filter pushdown)
  // ---------------------------------------------------------------------
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"), 18, 2)).cast(DoubleType).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice"), 18, 2) *
            (oneD - dec(col("l_discount"), 4, 2))).cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice"), 18, 2) *
            (oneD - dec(col("l_discount"), 4, 2)) *
            (oneD + dec(col("l_tax"), 4, 2))).cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"), 18, 2)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q02 — selective scan: filter + projection pushdown into parquet
  // ---------------------------------------------------------------------
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampNTZType) &&
              col("l_shipdate") <  lit("1998-01-01").cast(TimestampNTZType) &&
              col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_discount"),
              // single IEEE multiply: bit-identical across engines
              (col("l_extendedprice") * col("l_discount")).as("disc_amount"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
      |  l_extendedprice * l_discount AS disc_amount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------------
  // q03 — 3-way shuffle join + aggregation (customer ⋈ orders ⋈ lineitem)
  // ---------------------------------------------------------------------
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampNTZType))
    val l = Tables.lineitem(spark, dir)
    // customer is the small side — broadcast it; orders⋈lineitem shuffles
    // on the shared orderkey (one exchange each, co-partitioned join).
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        sum(dec(col("l_extendedprice"), 18, 2) *
            (oneD - dec(col("l_discount"), 4, 2))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q03Sql =
    """SELECT c_mktsegment, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY c_mktsegment, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q04 — star-schema broadcast joins (region ⋈ nation ⋈ customer)
  // ---------------------------------------------------------------------
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        countDistinct(col("c_custkey")).as("n_cust"),
        dsum(col("c_acctbal")).as("sum_bal"))
  }

  private val q04Sql =
    """SELECT r_name, n_name,
      |  COUNT(DISTINCT c_custkey) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q05 — left-semi join (EXISTS)
  // ---------------------------------------------------------------------
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private val q05Sql =
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q06 — left-anti join (NOT EXISTS)
  // ---------------------------------------------------------------------
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    // restrict to 'P' orders so the anti-join set is non-trivial
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin

  // ---------------------------------------------------------------------
  // q07 — ranking window functions (top-3 orders per customer)
  // ---------------------------------------------------------------------
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // unique (totalprice desc, orderkey) ordering → deterministic ranks
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= 3)
  }

  private val q07Sql =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drk
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------------
  // q08 — analytic window functions (running sum, lag) with frames
  // ---------------------------------------------------------------------
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_custkey"), col("o_orderkey"),
      sum(dec(col("o_totalprice"), 18, 2))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(DoubleType).as("running_spend"),
      lag(col("o_orderkey"), 1).over(w).as("prev_order"),
      lead(col("o_orderkey"), 1).over(w).as("next_order"))
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  LAG(o_orderkey, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------
  // q09 — global top-k (TakeOrderedAndProject: per-partition top-k, no
  //        full sort — the plan that survives 100 TB)
  // ---------------------------------------------------------------------
  private def q09(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private val q09Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q10 — set operations (INTERSECT / EXCEPT / UNION ALL)
  // ---------------------------------------------------------------------
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open   = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
    val filled = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val both   = open.intersect(filled).withColumn("tag", lit("both"))
    val onlyO  = open.except(filled).withColumn("tag", lit("open_only"))
    both.unionAll(onlyO).select(col("tag"), col("custkey"))
  }

  private val q10Sql =
    """SELECT 'both' AS tag, custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') a
      |UNION ALL
      |SELECT 'open_only' AS tag, custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') b""".stripMargin

  // ---------------------------------------------------------------------
  // q11 — ROLLUP (grouping sets) + COUNT(DISTINCT)
  // ---------------------------------------------------------------------
  private def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_custkey")).as("n_cust"),
        dsum(col("c_acctbal")).as("bal"))

  private val q11Sql =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
      |  COUNT(DISTINCT c_custkey) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin

  // ---------------------------------------------------------------------
  // q12 — JSON extraction on events.props
  // ---------------------------------------------------------------------
  private def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        (get_json_object(col("props"), "$.k").cast(LongType) % 10).as("k_mod"),
        col("value"))
      .groupBy(col("event_type"), col("k_mod"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  private val q12Sql =
    """SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q13 — event-time tumbling window aggregation (batch form of the
  //        Structured Streaming `window()` operator)
  // ---------------------------------------------------------------------
  private def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))

  private[operators] val q13Sql =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q14 — word count over documents: the reference's flagship semantics
  //        (split on \W+, drop empties, count per word —
  //        StatefulWordCount.java:104-132,134-180) as one declarative plan.
  // ---------------------------------------------------------------------
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  private[operators] val q14Sql =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(text, '\W+')) AS word FROM documents) t
      |WHERE length(word) > 0
      |GROUP BY word""".stripMargin

  // ---------------------------------------------------------------------
  // q15 — scalar string/math function breadth
  // ---------------------------------------------------------------------
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_type")).as("type_u"),
      lower(col("p_brand")).as("brand_l"),
      substring(col("p_name"), 1, 8).as("name8"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
      length(col("p_name")).as("name_len"),
      abs(col("p_retailprice") - 1000.0).as("abs_diff"),
      floor(col("p_size") / 3.0).cast(LongType).as("size_bucket"),
      sqrt(col("p_size").cast(DoubleType)).as("size_sqrt"),
      (col("p_size") % 7).as("size_mod"))

  private val q15Sql =
    """SELECT p_partkey,
      |  upper(p_type) AS type_u,
      |  lower(p_brand) AS brand_l,
      |  substring(p_name, 1, 8) AS name8,
      |  concat(p_brand, ':', p_type) AS brand_type,
      |  length(p_name) AS name_len,
      |  abs(p_retailprice - 1000.0) AS abs_diff,
      |  CAST(floor(p_size / 3.0) AS BIGINT) AS size_bucket,
      |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
      |  p_size % 7 AS size_mod
      |FROM part""".stripMargin

  // ---------------------------------------------------------------------
  // q16 — date/time function breadth
  // ---------------------------------------------------------------------
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      quarter(col("o_orderdate")).as("qtr"),
      datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"),
      date_add(col("o_orderdate").cast(DateType), 30).as("due_date"),
      date_trunc("month", col("o_orderdate")).as("month_start"))
  }

  private val q16Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  CAST(o_orderdate AS DATE) + 30 AS due_date,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------
  // q17 — exact percentiles (sort-based aggregate)
  // ---------------------------------------------------------------------
  private def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5D)"), 4).as("med_qty"),
        round(expr("percentile(l_extendedprice, 0.9D)"), 4).as("p90_price"),
        count(lit(1)).as("n"))

  private val q17Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q18 — CUBE grouping sets with grouping_id
  // ---------------------------------------------------------------------
  private def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("total"),
           grouping_id().as("gid"))

  private val q18Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------------
  // q19 — array functions + array aggregation (sorted collect per group).
  // The array ops (collect_list, sort_array, slice, element_at,
  // array_contains) all run as arrays; only the OUTPUT serializes the
  // array columns with array_join — the driver's pandas compare cannot
  // hash raw array cells (numpy.ndarray is unhashable).
  // ---------------------------------------------------------------------
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      // sort_array makes the nondeterministic collect_list order canonical
      .agg(sort_array(collect_list(col("n_name"))).as("nations"),
           count(lit(1)).as("n_nations"))
      .select(col("r_name"),
              array_join(col("nations"), "|").as("nations"),
              size(col("nations")).cast(LongType).as("n_nations"),
              element_at(col("nations"), 1).as("first_nation"),
              array_contains(col("nations"), "CHINA").as("has_china"),
              array_join(slice(col("nations"), 1, 3), "|").as("top3"))
  }

  private val q19Sql =
    """SELECT r_name,
      |  array_to_string(list_sort(list(n_name)), '|') AS nations,
      |  len(list_sort(list(n_name))) AS n_nations,
      |  list_sort(list(n_name))[1] AS first_nation,
      |  list_contains(list(n_name), 'CHINA') AS has_china,
      |  array_to_string(list_sort(list(n_name))[1:3], '|') AS top3
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // ---------------------------------------------------------------------
  // q20 — sliding event-time windows (1h window, 30min slide: each event
  //        lands in two windows)
  // ---------------------------------------------------------------------
  private def q20(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes")
                 .getField("start").as("win_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))

  private val q20Sql =
    """WITH cand AS (
      |  SELECT event_type, value,
      |    unnest([s0, s0 - 1800000000]) AS win_us, ts
      |  FROM (SELECT *, epoch_us(ts) - epoch_us(ts) % 1800000000 AS s0
      |        FROM events) t)
      |SELECT make_timestamp(win_us) AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM cand
      |WHERE epoch_us(ts) < win_us + 3600000000
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q21 — outer joins and their null semantics: customers keep a row even
  //        with no matching 'P' order (left outer); count(col) skips the
  //        null-extended rows while count(*) keeps them
  // ---------------------------------------------------------------------
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("o_orderkey")).as("n_orders"),
           countDistinct(col("c_custkey")).as("n_cust"),
           dsum(coalesce(col("o_totalprice"), lit(0.0))).as("p_spend"))
  }

  private val q21Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  COUNT(o_orderkey) AS n_orders,
      |  COUNT(DISTINCT c_custkey) AS n_cust,
      |  CAST(SUM(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS p_spend
      |FROM customer LEFT OUTER JOIN orders
      |  ON c_custkey = o_custkey AND o_orderstatus = 'P'
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q23 — full outer join (the join family with no broadcast path: both
  //        sides null-extend) between two per-customer aggregates, then
  //        presence classification over the null patterns
  // ---------------------------------------------------------------------
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("f_spend"))
    val op = o.filter(col("o_orderstatus") === "O").groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("o_spend"))
    f.join(op, Seq("o_custkey"), "full_outer")
      .select(
        when(col("f_spend").isNotNull && col("o_spend").isNotNull, "both")
          .when(col("f_spend").isNotNull, "f_only")
          .otherwise("o_only").as("tag"),
        col("f_spend"), col("o_spend"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n_cust"),
           sum(dec(coalesce(col("f_spend"), lit(0.0)), 18, 2))
             .cast(DoubleType).as("f_total"),
           sum(dec(coalesce(col("o_spend"), lit(0.0)), 18, 2))
             .cast(DoubleType).as("o_total"))
  }

  private val q23Sql =
    """WITH f AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS f_spend
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
      |o AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_spend
      |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
      |SELECT CASE WHEN f_spend IS NOT NULL AND o_spend IS NOT NULL THEN 'both'
      |            WHEN f_spend IS NOT NULL THEN 'f_only'
      |            ELSE 'o_only' END AS tag,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(coalesce(f_spend, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS f_total,
      |  CAST(SUM(CAST(coalesce(o_spend, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS o_total
      |FROM f FULL OUTER JOIN o USING (o_custkey)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q22 — correlated scalar subqueries (TPC-H Q17 shape), exercised
  //        through the SQL front-end so Catalyst's decorrelation rewrites
  //        them into aggregated joins. The threshold predicate
  //        qty < 0.5·avg(qty per part) is evaluated as exact decimal
  //        cross-multiplication (2·qty·cnt < sum), never a double
  //        division — double avg is partial-aggregation-order dependent
  //        and rows at the threshold would flip between runs/engines.
  // ---------------------------------------------------------------------
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q22_lineitem")
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        |FROM graft_q22_lineitem l1
        |WHERE 2 * CAST(l_quantity AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM graft_q22_lineitem l2
        |       WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |       FROM graft_q22_lineitem l3
        |       WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY l_returnflag""".stripMargin)
  }

  private val q22Sql =
    """SELECT l_returnflag, COUNT(*) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
      |FROM lineitem l1
      |WHERE 2 * CAST(l_quantity AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM lineitem l2
      |       WHERE l2.l_partkey = l1.l_partkey)
      |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
      |       FROM lineitem l3
      |       WHERE l3.l_partkey = l1.l_partkey)
      |GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q24 — pivot (wide conditional aggregation): order counts per status
  //        pivoted over an explicit priority list (explicit values keep
  //        the output schema static — at scale, value discovery would be
  //        an extra pass and a nondeterministic column set)
  // ---------------------------------------------------------------------
  private val q24Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private def q24(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", q24Priorities)
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        q24Priorities.zipWithIndex.map { case (p, i) =>
          coalesce(col(s"`$p`"), lit(0L)).as(s"p$i") }: _*)

  private val q24Sql =
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p0,
      |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p1,
      |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p2,
      |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p3,
      |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p4
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q25 — explicit GROUPING SETS: two disjoint one-dimension aggregates
  // in ONE pass over the fact table (the set shape neither rollup nor
  // cube expresses). Spark plans this as a single scan + Expand — at
  // 100 TB that halves the scan cost vs two separate groupBys unioned.
  // ---------------------------------------------------------------------
  private def q25(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("total"),
           grouping_id().as("gid"))

  private val q25Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin

  // ---------------------------------------------------------------------
  // q26 — table-generating (UDTF) surface: posexplode is Spark's lateral
  // view / generator shape — each document fans out to (pos, tok) rows
  // inside the Generate operator, which runs narrow (no shuffle at all:
  // the fan-out happens inside the scan's codegen stage, and at 100 TB
  // that is the only acceptable place for a 1→N row explosion — a
  // generator that forced an exchange would multiply shuffle volume by
  // the fan-out factor).
  // ---------------------------------------------------------------------
  private def q26(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("doc_id") < 100)
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .where(col("pos") < 3)

  private val q26Sql =
    """SELECT doc_id, g.i - 1 AS pos,
      |  list_extract(string_split(text, ' '), g.i) AS tok
      |FROM documents, generate_series(1, 3) g(i)
      |WHERE doc_id < 100 AND g.i <= len(string_split(text, ' '))""".stripMargin

  // ---------------------------------------------------------------------
  // q27 — the SQL registration route for the engine's custom Catalyst
  // expressions: the query goes through `spark.sql` text, so resolution
  // must find `graft_dot` in the function registry (GraftFunctions
  // .register / GraftExtensions injection), not the DataFrame DSL. The
  // expression is the same codegen'd DotProductD the DSL ops use —
  // registration is the only thing this row adds evidence for.
  // ---------------------------------------------------------------------
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("q27_embeddings")
    // neighbor-pair dot, not self-dot: the fixture's vectors are unit-norm,
    // so a self-dot reads 1.0 everywhere and would let a constant-output
    // bug in the function pass the oracle
    spark.sql(
      """SELECT a.vec_id, round(graft_dot(a.embedding, b.embedding), 4)
        |  AS dot_next
        |FROM q27_embeddings a JOIN q27_embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 50""".stripMargin)
  }

  private val q27Sql =
    """SELECT a.vec_id, round(list_sum(list_transform(generate_series(1, 64),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |  4) AS dot_next
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |WHERE a.vec_id < 50""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q01_pricing_summary", q01, Some(q01Sql)),
    QuerySpec("q02_filter_project", q02, Some(q02Sql)),
    QuerySpec("q03_join_agg", q03, Some(q03Sql)),
    QuerySpec("q04_broadcast_star_join", q04, Some(q04Sql)),
    QuerySpec("q05_semi_join", q05, Some(q05Sql)),
    QuerySpec("q06_anti_join", q06, Some(q06Sql)),
    QuerySpec("q07_window_rank", q07, Some(q07Sql)),
    QuerySpec("q08_window_running", q08, Some(q08Sql)),
    QuerySpec("q09_topk", q09, Some(q09Sql)),
    QuerySpec("q10_set_ops", q10, Some(q10Sql)),
    QuerySpec("q11_rollup_distinct", q11, Some(q11Sql)),
    QuerySpec("q12_json_extract", q12, Some(q12Sql)),
    QuerySpec("q13_time_window", q13, Some(q13Sql)),
    QuerySpec("q14_wordcount", q14, Some(q14Sql)),
    QuerySpec("q15_scalar_funcs", q15, Some(q15Sql)),
    QuerySpec("q16_date_funcs", q16, Some(q16Sql)),
    QuerySpec("q17_percentiles", q17, Some(q17Sql)),
    QuerySpec("q18_cube_grouping", q18, Some(q18Sql)),
    QuerySpec("q19_array_agg_funcs", q19, Some(q19Sql)),
    QuerySpec("q20_sliding_window", q20, Some(q20Sql)),
    QuerySpec("q21_outer_join", q21, Some(q21Sql)),
    QuerySpec("q22_correlated_subquery", q22, Some(q22Sql)),
    QuerySpec("q23_full_outer_join", q23, Some(q23Sql)),
    QuerySpec("q24_pivot", q24, Some(q24Sql)),
    QuerySpec("q25_grouping_sets", q25, Some(q25Sql)),
    QuerySpec("q26_generator_posexplode", q26, Some(q26Sql)),
    QuerySpec("q27_sql_registered_udf", q27, Some(q27Sql)))
}
