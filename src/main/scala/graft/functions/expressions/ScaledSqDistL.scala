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
  *  - non-finite products skip the BigDecimal step as Spark's RoundBase
  *    does (round() passes NaN/Infinity through) and then SATURATE via
  *    the legacy double→long conversion: NaN → 0, ±Inf →
  *    ±Long.MaxValue. This is deliberate fail-SOFT (round-7 advisor:
  *    BigDecimal.valueOf threw NumberFormatException): under Spark 4's
  *    default ANSI casts the exploded original throws CAST_OVERFLOW,
  *    but one malformed embedding should not kill a corpus-scale
  *    clustering job — a saturated distance can never win an argmin.
  *    Caveat: a NaN element contributes 0 (looks "near" on that dim),
  *    and two saturated elements wrap the long sum — acceptable for a
  *    distance ranking, not a general-purpose metric;
  *  - the per-element longs then sum exactly in any order (long
  *    addition is associative), so loop order vs shuffle order is
  *    immaterial — this is WHY the kernel scales distances to integers
  *    instead of summing doubles.
  * Float inputs are widened per element ((double)f is exact), same as
  * DotProductD.
  *
  * Unlike DotProductD (which inherits dot-product convention and
  * truncates to the shorter input), length-mismatched arrays FAIL
  * loudly: this kernel feeds argmin cluster assignment, where silently
  * scoring a malformed centroid/codebook row over a prefix would
  * produce a plausible-looking wrong assignment (round-7 advisor).
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
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"scaled_sq_dist: length mismatch ($n vs ${y.numElements()}) — " +
          "this kernel feeds argmin assignment; a truncated distance " +
          "would silently change cluster membership")
    val lf = leftIsFloat
    val rf = rightIsFloat
    var s = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      val p = d * d * scale
      // Spark round() semantics: non-finite passes through, the
      // double→long cast clamps (NaN→0, ±Inf→±Long.MaxValue)
      s += (if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) p
            else java.math.BigDecimal.valueOf(p)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue())
        .toLong
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
      val p = ctx.freshName("p")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "scaled_sq_dist: length mismatch (" + $n + " vs " +
         |      $b.numElements() + ") — this kernel feeds argmin " +
         |      "assignment; a truncated distance would silently change " +
         |      "cluster membership");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${get(a, left)} - ${get(b, right)};
         |  final double $p = $d * $d * ${scale}D;
         |  $s += (long) ((Double.isNaN($p) || Double.isInfinite($p)) ? $p
         |    : java.math.BigDecimal.valueOf($p)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue());
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
