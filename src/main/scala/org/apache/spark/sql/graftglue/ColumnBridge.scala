package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the classic Column↔Expression converters behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils, see
  * sql/core columnNodeSupport.scala); third-party engines that inject
  * native expressions re-export them from an sql subpackage — the same
  * access route SparkSessionExtensions-based libraries use. */
/** Re-export of Spark's `private[sql]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * so a library catalog table (outside the sql package) can opt into
  * the V1 streaming-sink fallback `DataStreamWriter.toTable` consults
  * — the integration route Delta's own DeltaTableV2 uses. */
trait V1FallbackBridge
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session (the runtime
    * counterpart of SparkSessionExtensions.injectFunction for sessions
    * the library didn't create). */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Wrap a custom logical plan as a DataFrame (the classic
    * Dataset.ofRows, private[sql] in Spark 4) — the invocation route
    * for library-defined logical operators planned by an injected
    * strategy. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap the micro-batch DataFrame a V1 streaming Sink receives as
    * a BATCH frame (its logical plan carries isStreaming leaves, so
    * `df.write`/reuse would throw "must be executed with
    * writeStream.start()"). Runs the already-planned incremental
    * physical plan once via `queryExecution.toRdd` — the same
    * re-batching Delta's DeltaSink does — with no extra shuffle and no
    * driver materialization. */
  def rebatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Eagerly unload every loaded state-store provider (they otherwise
    * stay resident until the ~60 s maintenance cycle — between a
    * stopped streaming query and a latency-sensitive batch phase that
    * residue is measurable). Later streaming queries re-load providers
    * on demand; StateStore.get restarts maintenance as needed. */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
