package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, UnresolvedAttribute, UnresolvedFunction, Literal => LitNode}

/** A Column predicate reduced to the boolean skeleton a min/max file-
  * pruning evaluator can reason about (Iceberg's inclusive-metrics
  * shape). Spark 4 Columns carry a ColumnNode AST (not Catalyst
  * expressions — those only exist post-analysis), so the walk happens
  * on `Column.node`; anything the walker doesn't recognize — other
  * columns, arithmetic, UDFs — folds to [[PredicateTree.Unknown]],
  * which every consumer must treat as "may match" (pruning can only
  * ever weaken, never wrong). */
object PredicateTree {

  sealed trait Node
  /** comparison between the key column and a long literal; `op` is the
    * normalized operator with the KEY ON THE LEFT (a reversed
    * `lit <= key` arrives as `key >= lit`) */
  final case class Cmp(op: String, value: Long) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(x: Node) extends Node
  final case class In(values: Seq[Long]) extends Node
  case object Unknown extends Node

  /** parse `predicate` relative to `keyCol` (other columns ⇒ Unknown) */
  def parse(predicate: Column, keyCol: String): Node =
    walk(predicate.node, keyCol)

  private def isKey(n: ColumnNode, keyCol: String): Boolean = n match {
    case a: UnresolvedAttribute => a.nameParts.lastOption.contains(keyCol)
    case _ => false
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

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // = is symmetric
  }

  private def walk(n: ColumnNode, k: String): Node = n match {
    case f: UnresolvedFunction => (f.functionName, f.arguments) match {
      case ("and", Seq(a, b)) => And(walk(a, k), walk(b, k))
      case ("or", Seq(a, b))  => Or(walk(a, k), walk(b, k))
      case ("!" | "not", Seq(a)) => Not(walk(a, k))
      case (op @ ("<" | "<=" | ">" | ">=" | "=" | "=="), Seq(a, b)) =>
        if (isKey(a, k) && litLong(b).isDefined) Cmp(normalize(op), litLong(b).get)
        else if (isKey(b, k) && litLong(a).isDefined)
          Cmp(flip(normalize(op)), litLong(a).get)
        else Unknown
      case ("in", key +: vs)
          if isKey(key, k) && vs.nonEmpty && vs.forall(litLong(_).isDefined) =>
        In(vs.map(litLong(_).get))
      case _ => Unknown
    }
    case _ => Unknown
  }

  private def normalize(op: String): String = if (op == "==") "=" else op
}
