package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Semantic contracts of the round-8 third batch: PMI collocations
  * (t18) and degree-oriented triangle counting (g02). Exact-value
  * parity with DuckDB is the Verify gate's job; these pin the
  * properties the value hash can't see. */
class Round8cOpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("t18 ranks contiguously by non-increasing pmi over min-count pairs") {
    val r = SparkEntry.queries("t18_pmi_collocations")(spark, sfDir)
      .orderBy(col("rnk")).collect()
    assert(r.nonEmpty && r.length <= 100)
    assert(r.map(_.getAs[Int]("rnk")).toSeq == (1 to r.length))
    val pmis = r.map(_.getAs[Long]("pmi_ppm")).toSeq
    assert(pmis == pmis.sorted.reverse, "rnk must follow pmi desc")
    assert(pmis.forall(_ >= 0))
    assert(r.forall(_.getAs[Long]("cnt") >= 5L))
  }

  test("t18 outranks raw frequency's stopword pairs") {
    // the op's reason to exist: t06 ranks by raw count and surfaces
    // glue-word pairs; PMI normalizes them away. The rank-1 PMI pair
    // must score strictly above the corpus's most FREQUENT pair —
    // equality would mean the normalization did nothing on this corpus
    val pmi = SparkEntry.queries("t18_pmi_collocations")(spark, sfDir)
      .orderBy(col("rnk")).limit(1).collect().head
    val byCnt = SparkEntry.queries("t18_pmi_collocations")(spark, sfDir)
      .orderBy(col("cnt").desc).limit(1).collect().head
    assert(pmi.getAs[Long]("pmi_ppm") >= byCnt.getAs[Long]("pmi_ppm"))
  }

  test("t18 is deterministic across runs (integer arithmetic, no FP)") {
    val a = rows(SparkEntry.queries("t18_pmi_collocations")(spark, sfDir))
    val b = rows(SparkEntry.queries("t18_pmi_collocations")(spark, sfDir))
    assert(a == b)
  }

  test("g02 counts each triangle once at each of its three corners") {
    val r = SparkEntry.queries("g02_triangle_count")(spark, sfDir)
      .orderBy(col("rnk")).collect()
    assert(r.nonEmpty && r.length <= 100)
    assert(r.map(_.getAs[Int]("rnk")).toSeq == (1 to r.length))
    val tris = r.map(_.getAs[Long]("tri")).toSeq
    assert(tris == tris.sorted.reverse, "rnk must follow tri desc")
    r.foreach { row =>
      val (deg, tri) = (row.getAs[Long]("deg"), row.getAs[Long]("tri"))
      assert(tri >= 1)
      // a node in t triangles pairs 2 distinct neighbors per triangle,
      // so its degree bounds the count: tri <= C(deg, 2)
      assert(tri <= deg * (deg - 1) / 2,
        s"${row.getAs[String]("word")}: tri=$tri exceeds C($deg,2)")
    }
  }

  test("g02 is deterministic across runs") {
    val a = rows(SparkEntry.queries("g02_triangle_count")(spark, sfDir))
    val b = rows(SparkEntry.queries("g02_triangle_count")(spark, sfDir))
    assert(a == b)
  }

  test("g03 detects more than one community, every label its own member") {
    val r = SparkEntry.queries("g03_label_propagation")(spark, sfDir)
      .orderBy(col("rnk")).collect()
    // a single community would mean the substrate degenerated back to a
    // clique — the co-activity graph must keep real structure
    assert(r.length > 1, "LPA collapsed to one community")
    assert(r.map(_.getAs[Int]("rnk")).toSeq == (1 to r.length))
    val sizes = r.map(_.getAs[Long]("n_members")).toSeq
    assert(sizes == sizes.sorted.reverse, "rnk must follow size desc")
    assert(sizes.forall(_ >= 1))
  }

  test("g03 is deterministic across runs (fixed rounds, ordered ties)") {
    val a = rows(SparkEntry.queries("g03_label_propagation")(spark, sfDir))
    val b = rows(SparkEntry.queries("g03_label_propagation")(spark, sfDir))
    assert(a == b)
  }

  test("t19 drift scores are nonnegative, ranked, over min-count words") {
    val r = SparkEntry.queries("t19_vocab_drift")(spark, sfDir)
      .orderBy(col("rnk")).collect()
    assert(r.nonEmpty && r.length <= 50)
    assert(r.map(_.getAs[Int]("rnk")).toSeq == (1 to r.length))
    val scores = r.map(_.getAs[Long]("chi2_micro")).toSeq
    assert(scores == scores.sorted.reverse, "rnk must follow chi2 desc")
    assert(scores.forall(_ >= 0), "chi-squared is a squared statistic")
    assert(r.forall(x => x.getAs[Long]("o1") + x.getAs[Long]("o2") >= 5L))
  }

  test("t19 is deterministic across runs (integer arithmetic)") {
    val a = rows(SparkEntry.queries("t19_vocab_drift")(spark, sfDir))
    val b = rows(SparkEntry.queries("t19_vocab_drift")(spark, sfDir))
    assert(a == b)
  }

  test("g03's sub-bucket cap is inactive on the gate corpus") {
    // the cap only prunes pairs inside buckets LARGER than the cap; the
    // gate corpus's buckets all fit inside one sub-bucket, so capped
    // and uncapped communities must coincide exactly
    val capped = rows(Graph.g03Communities(spark, sfDir, 16))
    val uncapped = rows(Graph.g03Communities(spark, sfDir, 1000000))
    assert(capped == uncapped)
  }
}
