package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF JOIN as a whole-operator Catalyst extension — the
  * preference-order (c) route (custom LogicalPlan + SparkStrategy +
  * SparkPlan) for semantics Spark's built-ins can't express directly.
  * x05 composes the same semantics from union + window (route (a));
  * this operator IS the as-of join: for every left row, the single
  * right row of the same key with the greatest (ts, tie) ≤ the left
  * row's ts — inner flavor (unmatched left rows drop).
  *
  * The physical shape is the sort-merge as-of: both sides declare
  * ClusteredDistribution on the key and (key, ts[, tie]) ascending
  * ordering, so EnsureRequirements inserts exactly one hash exchange
  * and one sort per side — identical exchange cost to an equi sort-
  * merge join — and the merge itself is a single forward pass per
  * partition holding ONE candidate row of state: the right cursor
  * advances monotonically, remembering only the latest row ≤ the
  * current left timestamp. Contrast with the window composition
  * (running last_value over the unioned stream — an extra union and a
  * window frame per row) and with the naive range join (a nested loop
  * at 100 TB). No per-key buffering, no range explosion; skew bounds
  * are the join key's own.
  *
  * Keys/timestamps/ties evaluate as Long (BIGINT keys, micros-encoded
  * timestamps — TIMESTAMP/TIMESTAMP_NTZ are Long internally), the
  * common shape of event-stream as-of joins.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** injected via SparkSessionExtensions.injectPlannerStrategy /
  * experimental.extraStrategies */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // one hash exchange per side on the key — the SMJ contract
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  // (key, ts[, tie]) ascending: the merge pass's entire precondition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val rBuf = ri.buffered
      // single-candidate state: the latest right row (key-matched,
      // ts ≤ current left ts) seen so far, copied out of the reused
      // cursor row
      var candKey = 0L
      var cand: InternalRow = null
      val joined = new JoinedRow
      // emit UnsafeRows: a parent operator (or a whole-plan collect with
      // no Project above) consumes this node's rows directly, and the
      // contract is UnsafeRow — a bare JoinedRow ClassCastExceptions in
      // getByteArrayRdd (caught by AsOfJoinSpec's shared-lineage test,
      // which is the first consumer with no projection on top)
      val toUnsafe = UnsafeProjection.create(output, output)
      li.flatMap { lrow =>
        val k = lk.eval(lrow).asInstanceOf[Long]
        val ts = lt.eval(lrow).asInstanceOf[Long]
        var advance = true
        while (advance && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rk.eval(head).asInstanceOf[Long]
          val ht = rt.eval(head).asInstanceOf[Long]
          if (hk < k || (hk == k && ht <= ts)) {
            candKey = hk
            cand = rBuf.next().copy()
          } else advance = false
        }
        if (cand != null && candKey == k) Some(toUnsafe(joined(lrow, cand)))
        else None
      }
    }
  }
}

/** The DataFrame-facing entry: resolves the named columns on each
  * side's analyzed plan, VALIDATES them at call time (the merge casts
  * evaluations to Long, so a wrong-typed column must fail here, not
  * as a ClassCastException deep inside a task), filters null
  * keys/timestamps (inner as-of semantics — DuckDB's ASOF drops them
  * the same way), registers the strategy on the session once, and
  * wraps the custom node as a DataFrame. Column names must be
  * disjoint across the two sides (the operator outputs both). */
object AsOf {
  import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

  private def requireLongBacked(name: String, dt: DataType,
                                role: String): Unit = dt match {
    case LongType | TimestampType | TimestampNTZType => ()
    case other => throw new IllegalArgumentException(
      s"as-of $role column `$name` must be BIGINT or a timestamp " +
        s"(Long-backed), got ${other.sql}")
  }

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightTie: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // null keys/timestamps can never match — drop them engine-side so
    // the merge never unboxes a null
    val lf = left.where(left.col(leftKey).isNotNull &&
                        left.col(leftTs).isNotNull)
    val rf = right.where(right.col(rightKey).isNotNull &&
                         right.col(rightTs).isNotNull &&
                         right.col(rightTie).isNotNull)
    val l = lf.queryExecution.analyzed
    val r0 = rf.queryExecution.analyzed
    // Self-join hygiene: two sides derived from the SAME DataFrame (or
    // a shared cache) carry identical ExprIds, and a custom binary node
    // gets none of the analyzer's dedup-right rules — duplicate ids
    // across left/right would make BindReferences resolve rightKey/
    // rightTs against the wrong side, a plan-dependent mis-bind rather
    // than a clear error. Re-alias the right side with fresh ExprIds
    // whenever the output sets overlap.
    val r =
      if (l.outputSet.intersect(r0.outputSet).isEmpty) r0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        r0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), r0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(l, leftKey), attr(r, rightKey))
    val (lt, rt) = (attr(l, leftTs), attr(r, rightTs))
    val tie = attr(r, rightTie)
    requireLongBacked(leftKey, lk.dataType, "left key")
    requireLongBacked(rightKey, rk.dataType, "right key")
    requireLongBacked(leftTs, lt.dataType, "left timestamp")
    requireLongBacked(rightTs, rt.dataType, "right timestamp")
    requireLongBacked(rightTie, tie.dataType, "right tie-break")
    org.apache.spark.sql.graftglue.ColumnBridge.ofRows(spark,
      AsOfJoin(l, r, lk, rk, lt, rt, tie))
  }
}
