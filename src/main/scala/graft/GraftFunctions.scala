package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.expressions.{DotProductD, SimHash32, SimHash64}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Two registration routes:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard library-injection path), or
  *  - `GraftFunctions.register(spark)` on a live session.
  *
  * Registered functions:
  *  - `graft_dot(array, array) -> double` — codegen'd dot product
  *  - `graft_simhash32(array<string>) -> bigint` — 32-bit SimHash
  *  - `graft_simhash64(array<string>) -> bigint` — 64-bit SimHash
  */
object GraftFunctions {

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // float/double arrays are read in place by DotProductD; any other
    // numeric array (SQL int literals, etc.) still routes through a cast.
    // When the argument is unresolved at builder invocation the builder
    // must insert an unconditional Cast (it cannot see the type yet) —
    // the round-7 advisor's asymmetry. plans.StripDotCast (injected by
    // both registration routes) removes that cast post-resolution when
    // the child is already array<float|double>, so the SQL route pays
    // the same zero-copy cost as the DataFrame route.
    "graft_dot" -> ((es: Seq[Expression]) => {
      def prep(e: Expression) = e match {
        case e if e.resolved => e.dataType match {
          case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _) => e
          case _ => Cast(e, ArrayType(DoubleType))
        }
        // unresolved at builder time: the unconditional cast is safe
        // (array<double>→array<double> is simplified away by Catalyst)
        case e => Cast(e, ArrayType(DoubleType))
      }
      DotProductD(prep(es(0)), prep(es(1)))
    }),
    "graft_simhash32" -> ((es: Seq[Expression]) => SimHash32(es.head)),
    "graft_simhash64" -> ((es: Seq[Expression]) => SimHash64(es.head)))

  /** runtime registration on an existing session: the SQL functions
    * plus the cast-stripping optimizer rule (same pair the extensions
    * route injects) */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      ColumnBridge.registerTempFunction(spark, name, b)
    }
    if (!spark.experimental.extraOptimizations
          .contains(graft.plans.StripDotCast))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.StripDotCast
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProductD].getName, name),
        b))
    }
    e.injectOptimizerRule(_ => graft.plans.StripDotCast)
    // the GRAFT HISTORY / GRAFT CHANGES command surface; everything
    // else delegates to Spark's parser verbatim
    e.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // ANSI UPDATE / MERGE INTO on catalog tables (x59): resolved
    // row-level statements over a graft table compile onto the
    // handle's stats-pruned mutation verbs (Delta's analysis-rule
    // route; see plans.GraftRowLevelRule)
    e.injectResolutionRule(session =>
      graft.plans.GraftRowLevelRule(session))
  }
}
