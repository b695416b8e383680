package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Pins the IVF `nprobe` knob (s04Probe): probing more cells can only
  * improve recall, and probing every cell recovers the exact answer. */
class SimilarityProbeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("nprobe covering every cell degenerates to exact brute force (= s01)") {
    // centroidsFor(500) cells in total; an oversized nprobe probes all
    // of them, so the candidate set is the full corpus — the result
    // must equal the exact window-formulated baseline bit-for-bit
    val all = Similarity.s04Probe(spark, sfDir, nprobe = Int.MaxValue)
    val exact = SparkEntry.queries("s01_knn_bruteforce")(spark, sfDir)
    assert(rows(all) == rows(exact))
  }

  test("raising nprobe monotonically improves every returned rank") {
    import org.apache.spark.sql.functions.col
    val p1 = Similarity.s04Probe(spark, sfDir, nprobe = 1)
      .select(col("query_id"), col("rnk"), col("cos_sim").as("cos1"))
    val p2 = Similarity.s04Probe(spark, sfDir, nprobe = 2)
      .select(col("query_id"), col("rnk"), col("cos_sim").as("cos2"))
    // nprobe=2's candidate set is a superset, so at every shared rank
    // the score can only be >= (round(,4) preserves monotonicity)
    val regressed = p1.join(p2, Seq("query_id", "rnk"))
      .where(col("cos2") < col("cos1")).count()
    assert(regressed == 0)
  }

  test("gated s04 is the nprobe=1 configuration") {
    val gated = SparkEntry.queries("s04_knn_ivf")(spark, sfDir)
    val probe1 = Similarity.s04Probe(spark, sfDir, nprobe = 1)
    assert(rows(gated) == rows(probe1))
  }

  test("s14 standing-index refresh touches only changed-key code rows") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a LOCALIZED fixture: 100 vectors in 5 key-range files on both
    // tables, then a merge confined to keys 96..100 — the refresh
    // must plan off the index manifest and rewrite ONLY the file
    // holding those keys (proven the house way: hide every other
    // index data file during the refresh)
    val baseRoot = graft.util.Scratch.dir("graft-s14spec-base")
    val idxRoot = graft.util.Scratch.dir("graft-s14spec-idx")
    def vec(k: Column) = array(k.cast("double"),
      (k * 2).cast("double"), lit(1.0))
    val e = spark.range(1, 101).toDF("vec_id")
      .select(col("vec_id"), vec(col("vec_id")).as("emb"))
    val base = graft.table.GraftTable.create(spark, baseRoot, "vec_id",
      e.repartitionByRange(5, col("vec_id")).sortWithinPartitions("vec_id"))
    val idx0 = graft.table.GraftTable.create(spark, idxRoot, "neighbor_id",
      Similarity.sq8Cols(e)
        .select(col("vec_id").as("neighbor_id"), col("qmin"),
                col("scale"), col("codes"), col("rn"))
        .repartitionByRange(5, col("neighbor_id"))
        .sortWithinPartitions("neighbor_id"))
    val idxFilesV1 = idx0.filesOf(1)
    assert(idxFilesV1.size == 5)
    // localized mutation: only keys 96..100 change
    base.merge(spark.range(96, 101).toDF("vec_id")
      .select(col("vec_id"), vec(col("vec_id") + 1000).as("emb")))
    // hide every index file EXCEPT the one holding the changed keys
    val holder = spark.read.parquet(idxFilesV1: _*)
      .withColumn("__f",
        regexp_replace(input_file_name(), "^file:(//)?", ""))
      .where(col("neighbor_id") >= 96)
      .select("__f").distinct().as[String].collect().toSeq
    val others = idxFilesV1.filterNot(holder.contains)
    assert(others.size == 4, s"expected 4 untouched files, got $others")
    import java.nio.file.{Files, Paths}
    others.foreach(f => Files.move(Paths.get(f), Paths.get(f + ".hidden")))
    try Similarity.s14Refresh(spark, baseRoot, idxRoot)
    finally others.foreach(f =>
      Files.move(Paths.get(f + ".hidden"), Paths.get(f)))
    // untouched files carried by reference; the refreshed index serves
    // the new codes for exactly the changed keys
    val idxFilesV2 = idx0.filesOf(idx0.head)
    assert(others.forall(idxFilesV2.contains),
      "untouched index files must carry by reference")
    assert(!holder.forall(idxFilesV2.contains),
      "the changed-key file must have been rewritten")
    val refreshed = idx0.read()
    assert(refreshed.count() == 100)
    val want = Similarity.sq8Cols(
        spark.range(96, 101).toDF("vec_id")
          .select(col("vec_id"), vec(col("vec_id") + 1000).as("emb")))
      .select(col("vec_id").as("neighbor_id"), col("qmin"),
              col("scale"), col("codes"), col("rn"))
    val got = refreshed.where(col("neighbor_id") >= 96)
    assert(rows(got) == rows(want),
      "refreshed code rows must equal a fresh requantization")
    // a second refresh run with nothing new delivers nothing (the
    // checkpointed version offset) and commits nothing
    val head = idx0.head
    Similarity.s14Refresh(spark, baseRoot, idxRoot)
    assert(idx0.head == head, "an empty window must not commit")
  }

  test("s13 matryoshka prefilter recalls well above chance vs exact") {
    import org.apache.spark.sql.functions.col
    // untrained-embedding regime: a random half-dimension prefix
    // correlates ~sqrt(1/2) with the full cosine, so the 10k pool is
    // what carries recall — measured 74% at sf0.001 / 76% at sf0.01;
    // pin a floor with fixture-regeneration slack (chance would be
    // ~ pool/corpus ≈ 10%)
    def pairs(name: String) =
      SparkEntry.queries(name)(spark, sfDir)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("s01_knn_bruteforce")
    val mrl = pairs("s13_knn_matryoshka")
    val recall = (exact & mrl).size.toDouble / exact.size
    assert(recall >= 0.6, f"matryoshka recall@5 $recall%.2f")
  }

  test("s07 PQ-ADC retrieves real neighbors, not noise") {
    // on the gap-free random fixture 16 codewords per subspace are very
    // coarse, so partial recall is the expected regime (the d10
    // pattern) — but ADC must still beat chance by a wide margin:
    // random top-5 picks from ~500 candidates would overlap the exact
    // set ~1% of the time; measured mean recall@5 is 0.26 at sf0.001.
    import org.apache.spark.sql.functions.col
    val exact = SparkEntry.queries("s01_knn_bruteforce")(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val pq = SparkEntry.queries("s07_knn_pq_adc")(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val nQueries = exact.select("query_id").distinct().count()
    val hits = exact.join(pq, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / (nQueries * 5)
    assert(recall >= 0.15,
      f"PQ-ADC mean recall@5 $recall%.2f fell below the pinned floor")
  }

  test("s15 IVF refresh touches only the AFFECTED cells' files; moves track cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.VectorFunctions.norm
    // a CONTROLLED quantizer: 4 fixed centroids, vector k lives in
    // cell k % 4 by construction (a scaled copy of its centroid), one
    // cell-list row per cell across 4 key-ranged files
    val baseRoot = graft.util.Scratch.dir("graft-s15spec-base")
    val cellRoot = graft.util.Scratch.dir("graft-s15spec-cells")
    val cvs = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
                  Seq(0.0, 0.0, 1.0), Seq(1.0, 1.0, 1.0))
    cvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("cid", "cv")
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"))
      .coalesce(1).write.parquet(s"$cellRoot/centroids")
    def vecOf(k: Long): Seq[Double] =
      cvs((k % 4).toInt).map(_ * (k + 1))
    val e = (1L to 100L).map(k => (k, vecOf(k))).toDF("vec_id", "emb")
    val base = graft.table.GraftTable.create(spark, baseRoot, "vec_id",
      e.repartitionByRange(5, col("vec_id")).sortWithinPartitions("vec_id"))
    val cells = graft.table.GraftTable.create(spark, cellRoot, "cluster",
      e.withColumn("cluster", col("vec_id") % 4)
        .withColumn("rn", norm(col("emb")))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("emb"),
          col("rn")))).as("members"))
        .repartitionByRange(4, col("cluster"))
        .sortWithinPartitions("cluster"))
    // vector 97 (cell 1) moves to cell 2: affected cells = {1, 2};
    // hide every cell file holding NEITHER — the refresh must never
    // open them (the cluster key's manifest ranges prune the read)
    base.merge(Seq((97L, Seq(0.0, 0.0, 55.0))).toDF("vec_id", "emb"))
    val fileClusters = cells.filesOf(1).map(f =>
      f -> spark.read.parquet(f).select(col("cluster"))
        .collect().map(_.getLong(0)).toSet)
    val unaffected = fileClusters.collect {
      case (f, cs) if !cs.contains(1L) && !cs.contains(2L) => f }
    assert(unaffected.nonEmpty, s"fixture must isolate cells: $fileClusters")
    import java.nio.file.{Files, Paths}
    unaffected.foreach(f => Files.move(Paths.get(f), Paths.get(f + ".h")))
    try Similarity.s15Refresh(spark, baseRoot, cellRoot)
    finally unaffected.foreach(f =>
      Files.move(Paths.get(f + ".h"), Paths.get(f)))
    assert(unaffected.forall(cells.filesOf(cells.head).contains),
      "unaffected cell files must carry by reference")
    def membersOf(c: Long): Map[Long, Seq[Double]] =
      cells.read().where(col("cluster") === c)
        .select(explode(col("members")).as("m"))
        .select(col("m.vec_id"), col("m.emb"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(!membersOf(1L).contains(97L),
      "the moved vector must leave its OLD cell's list")
    assert(membersOf(2L).get(97L).contains(Seq(0.0, 0.0, 55.0)),
      "...and join its NEW cell with the postimage vector")
    // an empty window neither reads nor commits
    val h = cells.head
    Similarity.s15Refresh(spark, baseRoot, cellRoot)
    assert(cells.head == h, "an empty window must not commit")
    // delete and insert paths: 96 (cell 0) leaves; 200 (cell 3 by its
    // vector) arrives — one more window, two more affected cells
    base.delete(col("vec_id") === 96)
    base.merge(Seq((200L, cvs(3).map(_ * 7.0))).toDF("vec_id", "emb"))
    Similarity.s15Refresh(spark, baseRoot, cellRoot)
    assert(!membersOf(0L).contains(96L), "a deleted vector leaves its cell")
    assert(membersOf(3L).contains(200L), "an inserted vector joins its cell")
  }

  test("gated s02 is the nflips=0 (single-bucket) configuration") {
    val gated = SparkEntry.queries("s02_knn_lsh")(spark, sfDir)
    val probe0 = Similarity.s02Probe(spark, sfDir, nflips = 0)
    assert(rows(gated) == rows(probe0))
  }

  test("multi-probe flips monotonically improve every returned rank") {
    import org.apache.spark.sql.functions.col
    // flipping bits only ADDS probe buckets, so nflips=4's candidate
    // set is a superset of nflips=0's: at every shared (query, rank)
    // the score can only be >=, and no query can return fewer rows
    val p0 = Similarity.s02Probe(spark, sfDir, nflips = 0)
      .select(col("query_id"), col("rnk"), col("cos_sim").as("cos0"))
    val p4 = Similarity.s02Probe(spark, sfDir, nflips = 4)
      .select(col("query_id"), col("rnk"), col("cos_sim").as("cos4"))
    val joined = p0.join(p4, Seq("query_id", "rnk"))
    assert(joined.count() == p0.count(), "a returned rank disappeared")
    assert(joined.where(col("cos4") < col("cos0")).count() == 0)
    // and the knob does real work on this (deterministic) corpus:
    // 4 extra probes fill every query's top-5 (45 → 50 rows) and
    // strictly improve almost every shared rank
    assert(p4.count() == 50)
    assert(joined.where(col("cos4") > col("cos0")).count() >= 40)
  }

  test("s08 SQ8 rerank recovers the exact top-k on the fixture") {
    // int8 reconstruction error is small relative to this corpus's
    // similarity gaps, so the 3k candidate pool must contain every true
    // neighbor and the exact rerank must reproduce s01 verbatim — the
    // compression path costs recall only when quantization error
    // crosses a pair's score gap
    import org.apache.spark.sql.functions.col
    val cols = Seq("query_id", "rnk", "neighbor_id").map(col)
    val sq = graft.SparkEntry.queries("s08_knn_sq8_rerank")(spark, sfDir)
      .select(cols: _*).collect().map(_.toSeq).toSet
    val exact = graft.SparkEntry.queries("s01_knn_bruteforce")(spark, sfDir)
      .select(cols: _*).collect().map(_.toSeq).toSet
    assert(sq === exact)
  }

  test("s06 Lloyd update never increases total within-cluster cost") {
    import org.apache.spark.sql.functions.{col, sum}
    val (a1, a2) = Similarity.kmeansIterations(spark, sfDir)
    def cost(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("dist_scaled"))).collect().head.getLong(0)
    // the defining property of Lloyd's algorithm: re-centering then
    // re-assigning is non-increasing in the summed squared distance
    // (exact here — the scaled-integer distances make the comparison
    // noise-free). Also pins the assignment surface: every vector
    // assigned exactly once, clusters within the seeded range.
    assert(cost(a2) <= cost(a1))
    val n = a2.count()
    assert(a2.select(col("vec_id")).distinct().count() === n)
    val clusters = a2.select(col("cluster")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf((0L until 8L).toSet))
  }
}
