package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only: print the formatted physical plan of one gated query.
  * With `exec`, run the query first and print the FINAL adaptive plan —
  * AQE performs exchange reuse at runtime, so the static plan can show
  * duplicate subtrees that one execution actually shares.
  * Usage: runMain graft.dev.ExplainOne <query> [sfDir] [exec] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val exec = args.contains("exec")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (exec) {
      // executeCollect on the SAME query execution finalizes its
      // AdaptiveSparkPlan (a write/count would plan a fresh execution
      // and leave this one's plan in the initial state)
      val qe = df.queryExecution
      qe.executedPlan.executeCollect()
      println(qe.executedPlan.toString)
    } else {
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
