package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, UnresolvedAttribute, UnresolvedFunction, Literal => LitNode}

/** A Column predicate reduced to the boolean skeleton a min/max file-
  * pruning evaluator can reason about (Iceberg's inclusive-metrics
  * shape). Spark 4 Columns carry a ColumnNode AST (not Catalyst
  * expressions — those only exist post-analysis), so the walk happens
  * on `Column.node`; anything the walker doesn't recognize —
  * column-to-column comparisons, arithmetic, UDFs — folds to
  * [[PredicateTree.Unknown]], which every consumer must treat as "may
  * match" (pruning can only ever weaken, never wrong).
  *
  * Comparisons carry their COLUMN NAME, so an evaluator with per-file
  * statistics for several columns (GraftTable's manifest stats) prunes
  * on every column it has bounds for — a conjunct over a column the
  * evaluator lacks stats on simply evaluates against the unbounded
  * range. */
object PredicateTree {

  sealed trait Node
  /** comparison between a column and a long literal; `op` is the
    * normalized operator with the COLUMN ON THE LEFT (a reversed
    * `lit <= c` arrives as `c >= lit`) */
  final case class Cmp(column: String, op: String, value: Long) extends Node
  /** comparison between a column and a STRING literal (same
    * normalization) — evaluators must compare in unsigned-UTF-8-byte
    * order (parquet's and Spark's string ordering), NOT
    * String.compareTo */
  final case class CmpS(column: String, op: String, value: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(x: Node) extends Node
  final case class In(column: String, values: Seq[Long]) extends Node
  final case class InS(column: String, values: Seq[String]) extends Node
  /** `column IS [NOT] NULL` — evaluable against per-file null counts
    * (Iceberg's null_value_counts) */
  final case class NullTest(column: String, isNull: Boolean) extends Node
  case object Unknown extends Node

  /** parse `predicate`'s boolean skeleton (unrecognized sub-trees ⇒
    * Unknown) */
  def parse(predicate: Column): Node = walk(predicate.node)

  /** every column an EQUALITY constraint (=, IN) tests anywhere in the
    * tree — the columns a bloom-filter refinement could consult.
    * Over-approximate (includes columns under NOT, which blooms never
    * prune through): loading an unused filter is harmless, missing a
    * used one isn't. */
  def equalityColumns(n: Node): Set[String] = n match {
    case And(a, b)     => equalityColumns(a) ++ equalityColumns(b)
    case Or(a, b)      => equalityColumns(a) ++ equalityColumns(b)
    case Not(x)        => equalityColumns(x)
    case Cmp(c, "=", _)  => Set(c)
    case CmpS(c, "=", _) => Set(c)
    case In(c, _)      => Set(c)
    case InS(c, _)     => Set(c)
    case _             => Set.empty
  }

  private def colName(n: ColumnNode): Option[String] = n match {
    case a: UnresolvedAttribute => a.nameParts.lastOption
    case _ => None
  }

  private def litLong(n: ColumnNode): Option[Long] = n match {
    case l: LitNode => l.value match {
      case v: Byte  => Some(v.toLong)
      case v: Short => Some(v.toLong)
      case v: Int   => Some(v.toLong)
      case v: Long  => Some(v)
      case _        => None
    }
    case _ => None
  }

  private def litStr(n: ColumnNode): Option[String] = n match {
    case l: LitNode => l.value match {
      case s: String => Some(s)
      case _         => None
    }
    case _ => None
  }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // = is symmetric
  }

  private def walk(n: ColumnNode): Node = n match {
    case f: UnresolvedFunction => (f.functionName, f.arguments) match {
      case ("and", Seq(a, b)) => And(walk(a), walk(b))
      case ("or", Seq(a, b))  => Or(walk(a), walk(b))
      case ("!" | "not", Seq(a)) => Not(walk(a))
      case (op @ ("<" | "<=" | ">" | ">=" | "=" | "=="), Seq(a, b)) =>
        (colName(a), litLong(b), colName(b), litLong(a)) match {
          case (Some(c), Some(v), _, _) => Cmp(c, normalize(op), v)
          case (_, _, Some(c), Some(v)) => Cmp(c, flip(normalize(op)), v)
          case _ =>
            (colName(a), litStr(b), colName(b), litStr(a)) match {
              case (Some(c), Some(v), _, _) => CmpS(c, normalize(op), v)
              case (_, _, Some(c), Some(v)) => CmpS(c, flip(normalize(op)), v)
              case _ => Unknown
            }
        }
      case ("in", key +: vs)
          if colName(key).isDefined && vs.nonEmpty &&
             vs.forall(litLong(_).isDefined) =>
        In(colName(key).get, vs.map(litLong(_).get))
      case ("in", key +: vs)
          if colName(key).isDefined && vs.nonEmpty &&
             vs.forall(litStr(_).isDefined) =>
        InS(colName(key).get, vs.map(litStr(_).get))
      case (fn, Seq(a)) if fn.equalsIgnoreCase("isnull") &&
          colName(a).isDefined =>
        NullTest(colName(a).get, isNull = true)
      case (fn, Seq(a)) if fn.equalsIgnoreCase("isnotnull") &&
          colName(a).isDefined =>
        NullTest(colName(a).get, isNull = false)
      case _ => Unknown
    }
    case _ => Unknown
  }

  private def normalize(op: String): String = if (op == "==") "=" else op
}
