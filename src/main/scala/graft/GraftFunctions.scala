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
    // Known asymmetry (round-7 advisor): the in-place fast path fires
    // only when the argument is already resolved at builder invocation —
    // in practice ResolveFunctions invokes builders on resolved children,
    // so SQL over real float columns takes it; an unresolved argument
    // falls back to the unconditional Cast, which Catalyst simplifies
    // away for array<double> but MATERIALIZES for array<float> (a per-row
    // copy the DataFrame path — VectorFunctions.dot — never pays). If a
    // SQL caller's plan shows a Cast above a float column here, route
    // hot-path code through the DataFrame API.
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

  /** runtime registration on an existing session */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerTempFunction(spark, name, b)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProductD].getName, name),
        b))
    }
}
