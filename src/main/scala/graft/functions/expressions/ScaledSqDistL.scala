package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd scaled-integer squared distance between two
  * `array<float|double>` vectors: Σᵢ round_half_up((aᵢ−bᵢ)²·scale) as
  * BIGINT — the deterministic distance kernel of the k-means family
  * (s06/s07/d10/p02), collapsed from its exploded formulation.
  *
  * The exploded shape (posexplode → join centroids on pos →
  * groupBy(vec, cluster) sum → argmin) pushes K·dim rows per vector
  * through a join and two hash aggregations; this expression computes
  * the same per-(vector, centroid) BIGINT in one fused loop, so the
  * assignment join carries K rows per vector and dim never appears in
  * a row count.
  *
  * Bit-identical to the exploded original by construction:
  *  - each element's (x−c)²·scale is rounded through the SAME
  *    BigDecimal HALF_UP path Spark's `round()` uses for doubles, then
  *    cast to long — not Math.round, whose floor(x+0.5) can differ at
  *    representability boundaries;
  *  - the per-element longs then sum exactly in any order (long
  *    addition is associative), so loop order vs shuffle order is
  *    immaterial — this is WHY the kernel scales distances to integers
  *    instead of summing doubles.
  * Float inputs are widened per element ((double)f is exact), same as
  * DotProductD.
  */
case class ScaledSqDistL(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"scaled_sq_dist requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  // hoisted: interpreted eval runs per row; re-deriving the element
  // type there would pattern-match the schema once per pair
  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = leftIsFloat
    val rf = rightIsFloat
    var s = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += java.math.BigDecimal.valueOf(d * d * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${get(a, left)} - ${get(b, right)};
         |  $s += (long) java.math.BigDecimal.valueOf($d * $d * ${scale}D)
         |    .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
