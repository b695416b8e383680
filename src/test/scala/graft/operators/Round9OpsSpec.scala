package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Round-9 contracts: fixture preconditions the as-of oracles lean on,
  * plus the pins for this round's new operators. */
class Round9OpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  test("purchase (user_id, ts) pairs are unique — the as-of tie-break is vacuous at fixture SFs") {
    // x05's DuckDB-native ASOF oracle has NO tie-break for duplicate
    // right-side (user_id, ts) pairs while the engine formulations pick
    // the greatest purchase_id deterministically (round-8 advisor).
    // x21 now carries its own explicit-tie-break oracle; x05 keeps the
    // cross-engine-native oracle on the strength of THIS precondition —
    // if a future fixture violates it, this spec fails before the
    // verify gate can flap nondeterministically.
    val dups = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).count()
      .where(col("count") > 1)
    assert(dups.isEmpty, "duplicate purchase (user_id, ts) pairs would " +
      "make x05's DuckDB ASOF oracle nondeterministic")
  }
}
