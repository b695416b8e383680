package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Dev probe: isolates the GraftTable mutation-cost split the ×16
  * ScaleProbe can't see (the gated x30-x34 time create + mutate + read
  * as one number, and create's staging dominates at ×16). Builds the
  * x31-shape range-clustered table from a corpus dir, then times each
  * phase separately — create (write + stats collection), the
  * stats-pruned merge, the MoR delete, the change feed, and one full
  * scan (= what the round-9 O(table) planner paid PER MUTATION just to
  * plan). Run against sf0.1 and the ScaleProbe ×16 corpus to see that
  * mutation cost tracks the touched key range, not the table.
  *
  * Usage: runMain graft.dev.TablePlanProbe [corpusDir] [label]
  */
object TablePlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = if (args.length > 1) args(1) else dir
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TABLEPROBE $label $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice").cast(DecimalType(18, 2)).as("o_price"))
    val mx = o.agg(max(col("o_orderkey"))).head.getLong(0)
    val t = timed("create") {
      graft.table.GraftTable.create(spark,
        graft.util.Scratch.dir("graft-tableprobe"), "o_orderkey",
        o.repartitionByRange(12, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
    }
    val upd = o
      .where(col("o_orderkey") % 37 === 0 && col("o_orderkey") <= mx / 4)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
              (col("o_price") * 2).cast(DecimalType(18, 2)).as("o_price"))
    val ins = o
      .where(col("o_orderkey") % 97 === 0)
      .select((lit(mx + 1) + col("o_orderkey")).as("o_orderkey"),
              lit("N").as("o_orderstatus"), col("o_price"))
    timed("merge")(t.merge(upd.unionByName(ins)))
    timed("delete_mor")(t.delete(
      col("o_orderkey") <= mx / 4 && col("o_orderkey") % 53 === 0,
      mode = "mor"))
    timed("changes")(t.changes(1, 3).count())
    timed("fullscan")(t.read().count())
    spark.stop()
  }
}
