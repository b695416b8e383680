package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession, Tables}

/** Semantic contracts of the round-8 operators: incremental aggregate
  * maintenance (x14), the KMV distinct sketch (x15), MaxSim late
  * interaction (s09), and curriculum ordering (p05). Exact-value
  * parity with DuckDB is the Verify gate's job; these pin the
  * properties the value hash can't see. */
class Round8OpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("x14 base+delta merge equals the flat recompute bit-for-bit") {
    // the materialized-view refresh contract: associative partial
    // states make the staged-base path value-identical to a full scan
    val merged = SparkEntry.queries("x14_incremental_agg")(spark, sfDir)
    val flat = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_price"))
    assert(rows(merged) == rows(flat))
  }

  test("x14 stages the base once per (jvm, dir)") {
    val p1 = ScaleOps.x14Stage(spark, sfDir)
    val p2 = ScaleOps.x14Stage(spark, sfDir)
    assert(p1 == p2)
  }

  test("x15 estimate tracks exact within 35% at k=64 (and exactly when small)") {
    // KMV standard error ≈ 1/√(k−2) ≈ 12.6% at k=64; 35% is ~3σ —
    // a failure here means the hash or the kth-min extraction broke,
    // not that the fixture was unlucky
    val r = SparkEntry.queries("x15_kmv_distinct_sketch")(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("exact_distinct")
      val est = row.getAs[Long]("kmv_estimate")
      if (exact < 64) assert(est === exact,
        s"below k the sketch must BE exact (exact=$exact est=$est)")
      else assert(math.abs(est - exact).toDouble / exact < 0.35,
        s"estimate $est too far from exact $exact")
    }
  }

  test("s09 maxsim dominates the best single-token cosine per doc pair") {
    // MaxSim = Σ over query tokens of per-token max ≥ any single
    // token-pair score; with 4 query tokens the score is also bounded
    // by 4 × the scale. Both bounds break if the max/sum grouping is
    // miswired (e.g. max over the wrong key would still hash-match on
    // a lucky fixture).
    val r = SparkEntry.queries("s09_maxsim_late_interaction")(spark, sfDir)
    val vals = r.select(col("maxsim_scaled")).collect().map(_.getLong(0))
    assert(vals.nonEmpty)
    assert(vals.forall(v => v <= 4L * 1000000L),
      "score exceeds n_tokens × scale — the per-token max leaked rows")
    // a doc never scores against itself
    assert(r.where(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("s09 ranking is contiguous 1..k per query doc") {
    val r = SparkEntry.queries("s09_maxsim_late_interaction")(spark, sfDir)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rnk")).as("lo"),
        max(col("rnk")).as("hi"))
      .collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n") === 5L)
      assert(row.getAs[Int]("lo") === 1)
      assert(row.getAs[Int]("hi") === 5)
    }
  }

  test("p05 train positions are a permutation, phase-monotone") {
    val r = SparkEntry.queries("p05_curriculum_order")(spark, sfDir)
      .select(col("doc_id"), col("phase"), col("train_pos")).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(r.length.toLong === n, "every doc gets exactly one position")
    val positions = r.map(_.getAs[Long]("train_pos")).sorted
    assert(positions.toSeq === (0L until n).toSeq,
      "positions must be a 0-based permutation with no gaps")
    // curriculum invariant: every phase-p position precedes phase-p+1
    val byPhase = r.groupBy(_.getAs[Long]("phase"))
      .map { case (p, rs) =>
        p -> (rs.map(_.getAs[Long]("train_pos")).min,
              rs.map(_.getAs[Long]("train_pos")).max)
      }.toSeq.sortBy(_._1)
    byPhase.sliding(2).foreach {
      case Seq((_, (_, hiA)), (_, (loB, _))) =>
        assert(hiA < loB, "phases must not interleave")
      case _ => ()
    }
  }
}
