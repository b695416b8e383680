package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector primitives over `array<float>` columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
  *
  * All arithmetic is promoted to DOUBLE elementwise and folded
  * left-to-right, so results are bit-identical to a sequential-sum
  * reference implementation (the DuckDB oracle mirrors the same order).
  */
object VectorFunctions {

  import org.apache.spark.sql.graftglue.ColumnBridge.{column => toColumn, expression => toExpr}

  import graft.functions.expressions.DotProductD

  /** elementwise dot product in double precision — codegen'd tight loop
    * (expressions.DotProductD) that reads float OR double arrays in
    * place (no cast materialization; float→double widening per element
    * is exact), same left-to-right fold as the HOF formulation so
    * values are unchanged */
  def dot(a: Column, b: Column): Column =
    toColumn(DotProductD(toExpr(a), toExpr(b)))

  /** scaled-integer squared distance: Σᵢ round((aᵢ−bᵢ)²·scale) as
    * BIGINT — one codegen loop; bit-identical to the exploded
    * round()+sum formulation (see expressions.ScaledSqDistL) */
  def scaledSqDist(a: Column, b: Column, scale: Double): Column =
    toColumn(graft.functions.expressions.ScaledSqDistL(
      toExpr(a), toExpr(b), scale))

  /** HOF reference implementation of dot (kept for tests: must equal
    * the codegen'd expression bit-for-bit) */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm in double precision */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity in double precision */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** cosine from a precomputed-norm pair — at all-pairs scale the norms
    * are computed once per vector, not once per pair */
  def cosinePrenormed(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
