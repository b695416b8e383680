package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, SqlExpression, UnresolvedAttribute, UnresolvedFunction, Literal => LitNode}

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

  /** rename every column reference through `f` — the column-mapping
    * bridge: a predicate written over LOGICAL names evaluates against
    * PHYSICAL-name-keyed per-file statistics (GraftTable x53) */
  def mapColumns(n: Node, f: String => String): Node = n match {
    case Cmp(c, op, v)  => Cmp(f(c), op, v)
    case CmpS(c, op, v) => CmpS(f(c), op, v)
    case And(l, r)      => And(mapColumns(l, f), mapColumns(r, f))
    case Or(l, r)       => Or(mapColumns(l, f), mapColumns(r, f))
    case Not(x)         => Not(mapColumns(x, f))
    case In(c, vs)      => In(f(c), vs)
    case InS(c, vs)     => InS(f(c), vs)
    case NullTest(c, b) => NullTest(f(c), b)
    case Unknown        => Unknown
  }

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
    // the FULL dotted path (round 18, nested struct-field stats):
    // `meta.price` must not collapse to `price`, which could alias a
    // DIFFERENT top-level column's stats and prune wrongly. The owner
    // of the per-file stats disambiguates qualifier vs struct path
    // against its schema (GraftTable.statsTree) — pre-resolution the
    // two are indistinguishable here.
    case a: UnresolvedAttribute if a.nameParts.nonEmpty =>
      Some(a.nameParts.mkString("."))
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
    // a predicate supplied as SQL TEXT (functions.expr — what the
    // GRAFT DELETE/OPTIMIZE WHERE commands carry): parse it with the
    // active session's parser and walk the catalyst skeleton, so
    // SQL-text predicates prune exactly like Column-built ones
    case s: SqlExpression =>
      try walkCatalyst(org.apache.spark.sql.SparkSession.active
        .sessionState.sqlParser.parseExpression(s.expression))
      catch { case scala.util.control.NonFatal(_) => Unknown }
    // a Column wrapping a CATALYST expression directly
    // (ColumnBridge.column — the route the ANSI UPDATE/MERGE
    // commands' rewritten clause predicates arrive on, x59/x63):
    // without this case they parsed as Unknown and the mutation read
    // every file the row filter would have re-checked anyway —
    // correct, but unpruned
    case e: org.apache.spark.sql.classic.ExpressionColumnNode =>
      walkCatalyst(e.expression)
    case _ => Unknown
  }

  /** the catalyst-side walk (parser output or analyzer-resolved
    * trees — same shape discipline as the ColumnNode walk: anything
    * unrecognized folds to Unknown) */
  private def walkCatalyst(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Node = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => UA}
    def cn(x: ce.Expression): Option[String] = x match {
      case u: UA if u.nameParts.nonEmpty =>
        Some(u.nameParts.mkString("."))
      case a: ce.AttributeReference => Some(a.name)
      // resolved struct-field access: emit the dotted stats path
      case g: ce.GetStructField =>
        cn(g.child).map(_ + "." + g.name.getOrElse(
          g.child.dataType.asInstanceOf[
            org.apache.spark.sql.types.StructType](g.ordinal).name))
      case _ => None
    }
    // literals may arrive wrapped in the analyzer's type-coercion
    // CAST (resolved trees: `k > 90` over a long column carries
    // cast(90 as bigint)) — fold the foldable literal cast so the
    // comparison still prunes
    def unlit(x: ce.Expression): Option[ce.Literal] = x match {
      case l: ce.Literal => Some(l)
      case c: ce.Cast if c.child.isInstanceOf[ce.Literal] &&
          c.resolved && c.foldable =>
        try Some(ce.Literal.create(c.eval(null), c.dataType))
        catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
    def ll(x: ce.Expression): Option[Long] = unlit(x).flatMap {
      case ce.Literal(v: Byte, _)  => Some(v.toLong)
      case ce.Literal(v: Short, _) => Some(v.toLong)
      case ce.Literal(v: Int, _)   => Some(v.toLong)
      case ce.Literal(v: Long, _)  => Some(v)
      case _ => None
    }
    def ls(x: ce.Expression): Option[String] = unlit(x).flatMap {
      case ce.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(v.toString)
      case ce.Literal(v: String, _) => Some(v)
      case _ => None
    }
    def cmp(a: ce.Expression, b: ce.Expression, op: String): Node =
      (cn(a), ll(b), cn(b), ll(a)) match {
        case (Some(c), Some(v), _, _) => Cmp(c, op, v)
        case (_, _, Some(c), Some(v)) => Cmp(c, flip(op), v)
        case _ => (cn(a), ls(b), cn(b), ls(a)) match {
          case (Some(c), Some(v), _, _) => CmpS(c, op, v)
          case (_, _, Some(c), Some(v)) => CmpS(c, flip(op), v)
          case _ => Unknown
        }
      }
    e match {
      case ce.And(a, b) => And(walkCatalyst(a), walkCatalyst(b))
      case ce.Or(a, b)  => Or(walkCatalyst(a), walkCatalyst(b))
      case ce.Not(x)    => Not(walkCatalyst(x))
      case ce.EqualTo(a, b)            => cmp(a, b, "=")
      case ce.LessThan(a, b)           => cmp(a, b, "<")
      case ce.LessThanOrEqual(a, b)    => cmp(a, b, "<=")
      case ce.GreaterThan(a, b)        => cmp(a, b, ">")
      case ce.GreaterThanOrEqual(a, b) => cmp(a, b, ">=")
      case ce.In(key, vs) if cn(key).isDefined && vs.nonEmpty &&
          vs.forall(ll(_).isDefined) =>
        In(cn(key).get, vs.map(ll(_).get))
      case ce.In(key, vs) if cn(key).isDefined && vs.nonEmpty &&
          vs.forall(ls(_).isDefined) =>
        InS(cn(key).get, vs.map(ls(_).get))
      case ce.IsNull(a) if cn(a).isDefined =>
        NullTest(cn(a).get, isNull = true)
      case ce.IsNotNull(a) if cn(a).isDefined =>
        NullTest(cn(a).get, isNull = false)
      case _ => Unknown
    }
  }

  private def normalize(op: String): String = if (op == "==") "=" else op
}
