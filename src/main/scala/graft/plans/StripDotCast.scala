package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.expressions.DotProductD

/** Injected optimizer rule: drop the `cast(array<float> → array<double>)`
  * under [[DotProductD]] that the SQL function builder inserts when its
  * argument is unresolved at build time (GraftFunctions notes the
  * asymmetry — round-7 advisor finding).
  *
  * Why it's safe: DotProductD reads float elements in place and widens
  * per element, and `(double) f` is exact (binary32 embeds in binary64),
  * so the stripped plan is bit-identical to the cast-then-dot plan —
  * it just skips materializing a fresh 64-element double array per ROW
  * (per PAIR in the all-pairs ops, where the cast sat in a post-join
  * projection: O(n²) allocations) and keeps shuffled vectors at float
  * width. With this rule the SQL route (`spark.sql("... graft_dot
  * ...")`) pays the same zero-copy cost as the DataFrame route
  * (VectorFunctions.dot), whichever way the user reaches the function.
  *
  * A no-op cast (array<double> → array<double>) is already removed by
  * Catalyst's SimplifyCasts; this rule handles the float case Catalyst
  * cannot know is loss-free for this specific consumer.
  */
object StripDotCast extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c @ Cast(child, ArrayType(DoubleType, _), _, _) =>
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) => child
        case _                                    => c
      }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ DotProductD(l, r)
          if (strip(l) ne l) || (strip(r) ne r) =>
        DotProductD(strip(l), strip(r))
    }
}
