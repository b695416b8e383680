package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Semantic contracts of the round-8 fourth batch: manifest-driven
  * file pruning (x17), the sampled-frame table (m04), and the
  * streaming KMV sketch (w16). Exact-value parity with DuckDB is the
  * Verify gate's job; these pin the properties the value hash can't
  * see — above all that x17's pruning actually prunes and that w16's
  * bounded state converges to the batch sketch. */
class Round8dOpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("x17 plans strictly fewer files than the manifest lists") {
    val (picked, total) = ScaleOps.x17Plan(spark, sfDir)
    assert(total > 1, "layout must split into multiple files")
    assert(picked.nonEmpty, "the query window must be covered")
    assert(picked.length < total,
      s"no pruning: ${picked.length} of $total files selected")
  }

  test("x17 pruned result equals the unpruned filtered scan") {
    // pruning may never change results: the exact predicate re-applies
    // after the file cut, so the manifest can only skip files that
    // contribute nothing
    val pruned = SparkEntry.queries("x17_manifest_pruned_scan")(spark, sfDir)
    val (data, _) = ScaleOps.x17Stage(spark, sfDir)
    val full = spark.read.parquet(data)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
             col("l_shipdate") <  lit("1995-04-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"))
    val prunedCounts = pruned.select("l_returnflag", "n_rows")
    assert(rows(prunedCounts) == rows(full))
  }

  test("x17 stages the layout and manifest once per (jvm, dir)") {
    val p1 = ScaleOps.x17Stage(spark, sfDir)
    val p2 = ScaleOps.x17Stage(spark, sfDir)
    assert(p1 == p2)
  }

  test("m04 emits at most 4 sampled frames per payload, contiguously indexed") {
    val f = SparkEntry.queries("m04_multimodal_frame_table")(spark, sfDir)
    val perDoc = f.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), collect_list(col("frame_idx")).as("idxs"))
      .collect()
    perDoc.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n >= 1 && n <= 4, s"doc ${r.getAs[Long]("doc_id")}: $n frames")
      assert(r.getSeq[Int](r.fieldIndex("idxs")).sorted == (0 until n.toInt),
        "frame_idx must be dense from 0")
    }
    // images are single-frame by the decode stub's contract
    val img = f.where(col("fmt") === "image")
      .agg(max(col("n_frames"))).collect().head.getInt(0)
    assert(img == 1)
  }

  test("x18 snapshots are nested file sets and v1 ignores v2's append") {
    val v1 = ScaleOps.x18Snapshot(spark, sfDir, 1)
    val v2 = ScaleOps.x18Snapshot(spark, sfDir, 2)
    assert(v1.nonEmpty && v2.size > v1.size,
      "v2 must append files to v1's set")
    assert(v1.toSet.subsetOf(v2.toSet),
      "append-only commits: v1's files must all survive into v2")
    // snapshot isolation: reading AS OF v1 after v2 exists returns
    // exactly the pre-append rows
    val out = SparkEntry.queries("x18_snapshot_time_travel")(spark, sfDir)
    val n1 = out.where(col("version") === 1)
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    val n2 = out.where(col("version") === 2)
      .agg(sum(col("n_rows"))).collect().head.getLong(0)
    assert(n1 < n2, s"v1 ($n1 rows) must be a strict subset of v2 ($n2)")
  }

  test("p06 report internals are mutually consistent") {
    val r = SparkEntry.queries("p06_corpus_report")(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (docs, dups) =
        (row.getAs[Long]("n_docs"), row.getAs[Long]("n_dup_docs"))
      assert(dups >= 0 && dups < docs)
      assert(row.getAs[Long]("chars_min") <= row.getAs[Long]("chars_max"))
      assert(row.getAs[Long]("chars_total") >= row.getAs[Long]("chars_max"))
      assert(row.getAs[Long]("n_langs") >= 1)
    }
  }

  test("x19 compaction shrinks the file set without changing the rows") {
    val (v2, v3) = ScaleOps.x19Stage(spark, sfDir)
    assert(v3.length < v2.length,
      s"compaction must reduce files: v2=${v2.length} v3=${v3.length}")
    val before = spark.read.parquet(v2: _*)
    val after = spark.read.parquet(v3: _*)
    assert(before.count() == after.count())
    assert(rows(before.groupBy(col("l_returnflag"))
             .agg(sum(col("l_orderkey")).as("s"))) ==
           rows(after.groupBy(col("l_returnflag"))
             .agg(sum(col("l_orderkey")).as("s"))))
  }

  test("x22 funnel stages are ordered, shrinking, and self-consistent") {
    val r = SparkEntry.queries("x22_funnel_analysis")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val (v, c, p) = (row.getAs[Long]("n_view"), row.getAs[Long]("n_click"),
      row.getAs[Long]("n_purchase"))
    // ordered qualification can only lose users stage over stage, and
    // the conversion window must actually drop some (an all-100% funnel
    // means the window stopped filtering — the degenerate first cut)
    assert(v >= c && c >= p, s"funnel grew: $v -> $c -> $p")
    assert(c < v, "conversion window must filter somebody")
    assert(p >= 0 && v > 0)
    assert(row.getAs[Long]("pct_click") == c * 100 / v)
    assert(row.getAs[Long]("pct_purchase") ==
      (if (c == 0) 0L else p * 100 / c))
  }

  test("x22 windows are key-partitioned (no global-sort funnel)") {
    val plan = SparkEntry.queries("x22_funnel_analysis")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id"))
    assert(!plan.contains("SinglePartition, Window") &&
      !plan.toLowerCase.contains("moving all data to a single partition"),
      s"funnel windows must partition by user:\n$plan")
  }

  test("s10 reports bounded per-query recall over the full query sample") {
    val r = SparkEntry.queries("s10_ann_recall")(spark, sfDir).collect()
    assert(r.length == 10, "one row per query vector")
    r.foreach { row =>
      val (k, hits, pct) = (row.getAs[Long]("k"),
        row.getAs[Long]("n_hits"), row.getAs[Long]("recall_pct"))
      assert(k == 5)
      assert(hits >= 0 && hits <= k)
      assert(pct == hits * 100 / k)
    }
    // the LSH index only earns its place if it finds SOMETHING: demand
    // nonzero aggregate recall on the fixture (a 0 here means the
    // bucketing broke, not that the corpus got unlucky)
    assert(r.map(_.getAs[Long]("n_hits")).sum > 0)
  }

  test("w16 drained streaming sketch equals the batch x15 estimate") {
    // the k smallest of a union is slicing-independent, so the stream's
    // final state must coincide with the batch sketch over the same rows
    val streamed = SparkEntry.queries("w16_stream_kmv_sketch")(spark, sfDir)
    val batch = SparkEntry.queries("x15_kmv_distinct_sketch")(spark, sfDir)
      .select(col("flag"), col("kmv_estimate"))
    assert(rows(streamed) == rows(batch))
  }
}
