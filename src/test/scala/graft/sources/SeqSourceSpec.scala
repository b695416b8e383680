package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts of the graft-seq batch DSv2 connector: pushed range
  * filters shrink what the source PLANS (not just what survives a
  * post-filter), column pruning reaches the reader, and the short
  * name resolves through the service registry. */
class SeqSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def table(n: Long) =
    spark.read.format("graft-seq").option("n", n).load()

  test("short name resolves and the table is the mixer's graph") {
    val rows = table(100).orderBy(col("id")).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("val") == SeqSourceProvider.mix(id))
      assert(r.getAs[String]("tag") == "t" + (id % 7))
    }
  }

  test("range pushdown prunes planned partitions, not just rows") {
    // 100k rows over 8 slices = 12.5k rows per slice; a [25k, 75k)
    // range must plan strictly fewer than 8 partitions' worth of ids —
    // observed via the scan's own description (range + partition math)
    val df = table(100000L)
      .where(col("id") >= 25000L && col("id") < 75000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[25000, 75000)"),
      s"pushed range must reach the scan:\n$plan")
    // no post-scan Filter on id: the source handled the range exactly
    assert(!plan.contains("Filter (id"),
      s"range filters must not re-evaluate above the scan:\n$plan")
    assert(df.count() == 50000L)
  }

  test("an empty pushed range plans zero partitions and returns nothing") {
    val df = table(1000L).where(col("id") >= 500L && col("id") < 500L)
    assert(df.count() == 0L)
  }

  test("column pruning reaches the scan") {
    val df = table(1000L).select(col("tag"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=tag"),
      s"pruned column set must reach the reader:\n$plan")
  }

  test("MaxValue-bound range filters saturate instead of wrapping") {
    // exclusive-bound conversion adds 1 to an inclusive bound; before
    // the round-9 fix Long.MaxValue + 1 wrapped, so `id > MaxValue`
    // returned ALL rows and `id <= MaxValue` NONE — silently, since
    // accepted filters never re-check post-scan (round-8 advisor)
    assert(table(1000L).where(col("id") > Long.MaxValue).count() == 0L)
    assert(table(1000L).where(col("id") <= Long.MaxValue).count() == 1000L)
    assert(table(1000L).where(col("id") === Long.MaxValue).count() == 0L)
  }

  test("unsupported predicates fall back to engine-side filtering, correctly") {
    // a val predicate can't absorb into the range; the source must
    // report it back and Spark must still produce the right answer
    val df = table(1000L).where(col("val") % 2 === 0)
    val viaSource = df.count()
    val expected = (0L until 1000L).count(SeqSourceProvider.mix(_) % 2 == 0)
    assert(viaSource == expected)
  }

  test("COUNT/MIN/MAX push completely: one metadata partition, no re-aggregation") {
    val df = table(100000L)
      .where(col("id") >= 25000L && col("id") < 75000L)
      .agg(count(lit(1)).as("n_rows"), min(col("id")).as("min_id"),
           max(col("id")).as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed-aggregates=COUNT(*),MIN(id),MAX(id)"),
      s"aggregates must reach the scan:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must leave no aggregation above the scan:\n$plan")
    // closed-form answer off ONE metadata partition — no data-column
    // materialization, no per-id iteration
    assert(df.rdd.getNumPartitions == 1)
    assert(df.collect().map(_.toSeq).toSeq ==
      Seq(Seq(50000L, 25000L, 74999L)))
  }

  test("pushed aggregates over an empty range match global-agg-on-empty semantics") {
    val row = table(1000L).where(col("id") >= 500L && col("id") < 500L)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).head
    assert(row.getLong(0) == 0L && row.isNullAt(1) && row.isNullAt(2))
  }

  test("grouped or non-id aggregates stay engine-side, correctly") {
    // group-by and SUM are not supported by the source — Spark must
    // keep its own aggregation and still be right
    val grouped = table(70L).groupBy(col("tag")).agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString
      .contains("HashAggregate"))
    assert(grouped.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap == (0 to 6).map(i => s"t$i" -> 10L).toMap)
    val summed = table(100L).agg(sum(col("id"))).head.getLong(0)
    assert(summed == (0L until 100L).sum)
  }
}
