package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Semantic contracts of the round-8 second batch: the BPE merge loop
  * (t17), the SCD2 apply step (x16), and p02's capped SemDeDup stage.
  * Exact-value parity with DuckDB is the Verify gate's job; these pin
  * the properties the value hash can't see. */
class Round8bOpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("t17 emits one merge per iteration with non-increasing counts") {
    val m = SparkEntry.queries("t17_bpe_merge_loop")(spark, sfDir)
      .orderBy(col("it")).collect()
    assert(m.map(_.getAs[Int]("it")).toSeq == (1 to m.length),
      "iterations must be contiguous from 1")
    assert(m.nonEmpty && m.length <= 4)
    // a merge consumes occurrences and any pair it creates is bounded
    // by the merged pair's own count, so the winning count can never
    // rise across iterations — a rise means recounting ran on a stale
    // segmentation
    val counts = m.map(_.getAs[Long]("cnt")).toSeq
    assert(counts == counts.sorted.reverse, s"counts rose: $counts")
    m.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("sym_a") + r.getAs[String]("sym_b"))
    }
  }

  test("t17's first merge is exactly t16's rank-1 pair") {
    // iteration 1 runs over single-character symbols, so its pair
    // statistic must coincide with t16's corpus-wide character-pair
    // count — the two ops share ground truth by construction
    val first = SparkEntry.queries("t17_bpe_merge_loop")(spark, sfDir)
      .where(col("it") === 1).collect().head
    val top = SparkEntry.queries("t16_bpe_pair_counts")(spark, sfDir)
      .where(col("rnk") === 1).collect().head
    assert(first.getAs[String]("merged") == top.getAs[String]("pair"))
    assert(first.getAs[Long]("cnt") == top.getAs[Long]("cnt"))
  }

  test("x16 apply over the staged history equals the flat recompute") {
    // the CDC-apply contract: close-and-union against the standing
    // history is value-identical to re-deriving SCD2 from the full
    // change stream (x13)
    val applied = SparkEntry.queries("x16_scd2_apply")(spark, sfDir)
    val flat = SparkEntry.queries("x13_scd2_history")(spark, sfDir)
    assert(rows(applied) == rows(flat))
  }

  test("x16 stages the base history once per (jvm, dir)") {
    val p1 = ScaleOps.x16Stage(spark, sfDir)
    val p2 = ScaleOps.x16Stage(spark, sfDir)
    assert(p1 == p2)
  }

  test("g01 ranks are positive, mass-bounded, and contiguously ranked") {
    val r = SparkEntry.queries("g01_word_pagerank")(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 100)
    assert(r.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to r.length))
    val ranks = r.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("rank_scaled"))
    assert(ranks.forall(_ > 0))
    assert(ranks.toSeq == ranks.sorted.reverse.toSeq, "rnk must follow rank desc")
    // total rank mass never exceeds the scaled unit: dangling mass only
    // LEAKS (the documented simplification) — a sum above SCALE means
    // an inflow double-counted somewhere
    assert(ranks.sum <= 1000000000000L)
  }

  test("g01 is deterministic across runs (integer arithmetic, no FP)") {
    val a = rows(SparkEntry.queries("g01_word_pagerank")(spark, sfDir))
    val b = rows(SparkEntry.queries("g01_word_pagerank")(spark, sfDir))
    assert(a == b)
  }

  test("w15 drained streaming history equals the batch x13 derivation") {
    // the replay slices events into arbitrary (unordered) micro-batches,
    // so this equality also proves the state machine is insensitive to
    // arrival order
    val streamed = SparkEntry.queries("w15_stream_scd2")(spark, sfDir)
    val batch = SparkEntry.queries("x13_scd2_history")(spark, sfDir)
    assert(rows(streamed.select("user_id", "event_id", "event_type",
      "value", "valid_from", "valid_to", "is_current")) ==
      rows(batch.select("user_id", "event_id", "event_type",
        "value", "valid_from", "valid_to", "is_current")))
  }

  test("p02's capped SemDeDup flags a subset of the exhaustive dups") {
    // the cap only REMOVES comparisons (cross-sub-bucket pairs), so
    // every capped dup must also be an uncapped dup, and a cap larger
    // than any cluster must reproduce the exhaustive result exactly
    def dups(cap: Option[Int]) =
      Dedup.semdedupFlags(spark, sfDir, cap)
        .where(col("is_dup") === 1).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
    val exhaustive = dups(None)
    assert(dups(Some(32)).subsetOf(exhaustive))
    assert(dups(Some(1000000)) == exhaustive)
  }
}
