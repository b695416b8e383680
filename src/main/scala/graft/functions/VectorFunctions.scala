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

  /** elementwise dot product in double precision */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** squared L2 norm in double precision */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))

  /** cosine similarity in double precision */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))
}
