package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Contracts of the native as-of join operator (custom LogicalPlan +
  * injected strategy + physical merge): plan shape, equivalence with
  * the composed x05 formulation, and the single-candidate merge's
  * edge semantics. */
class AsOfJoinSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("x21 plans as AsOfJoinExec with one exchange and one sort per side") {
    val df = SparkEntry.queries("x21_native_asof_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom operator missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 2,
      s"expected exactly one hash exchange per side, got $exchanges:\n$plan")
    val sorts = "Sort \\[".r.findAllMatchIn(plan).length
    assert(sorts == 2,
      s"EnsureRequirements must insert exactly the two merge sorts:\n$plan")
  }

  test("x21 equals the composed window formulation (x05)") {
    val native = SparkEntry.queries("x21_native_asof_join")(spark, sfDir)
    val composed = SparkEntry.queries("x05_asof_join")(spark, sfDir)
    assert(rows(native) == rows(composed))
  }

  test("merge semantics: latest at-or-before match, unmatched lefts drop") {
    import spark.implicits._
    // hand-built fixture covering the edges: equal timestamps (match
    // allowed), a left row before any right (drops), ties inside one
    // (key, ts) broken by the tie column's maximum, key isolation
    val lefts = Seq(
      (1L, 10L, 100L), // after both purchases of key 1 → latest (ts 8)
      (1L, 5L, 101L),  // equal-ts match allowed → purchase at ts 5
      (2L, 3L, 102L),  // before key 2's only purchase → drops
      (3L, 9L, 103L)   // key 3 has no purchases → drops
    ).toDF("k", "ts", "lid")
    val rights = Seq(
      (1L, 5L, 200L), (1L, 5L, 201L), // tie at (1,5) → greatest tie 201
      (1L, 8L, 202L),
      (2L, 7L, 203L)
    ).toDF("rk", "rts", "rid")
    val out = AsOf.join(lefts, rights, "k", "rk", "ts", "rts", "rid")
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 202L), (101L, 201L)))
  }

  test("shared-lineage sides (identical ExprIds) re-alias instead of mis-binding") {
    import spark.implicits._
    // both sides ARE the same DataFrame — every attribute id collides.
    // Before the round-9 guard, BindReferences could resolve the right-
    // side expressions against the wrong child (plan-dependent, not a
    // clear error — round-8 advisor); AsOf.join now re-aliases the
    // right side with fresh ids whenever the output sets overlap.
    val events = Seq((1L, 5L, 100L), (1L, 8L, 101L), (2L, 3L, 102L))
      .toDF("k", "ts", "tie")
    val out = AsOf.join(events, events, "k", "k", "ts", "ts", "tie")
      .collect().map(_.toSeq).toSet
    // self as-of: every row's latest match at-or-before itself IS itself
    assert(out == Set(
      Seq(1L, 5L, 100L, 1L, 5L, 100L),
      Seq(1L, 8L, 101L, 1L, 8L, 101L),
      Seq(2L, 3L, 102L, 2L, 3L, 102L)))
  }
}
