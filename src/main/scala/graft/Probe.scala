package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dump: verifies pushdown/broadcast/codegen expectations
  * (run manually; not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.headOption match {
      case Some(name) =>
        println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case None =>
        Seq("q02_filter_project", "q03_join_agg", "q04_broadcast_star_join",
            "q09_topk").foreach { n =>
          println(s"===== $n =====")
          println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode))
        }
    }
    spark.stop()
  }
}
