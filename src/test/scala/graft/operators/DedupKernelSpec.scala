package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup.ShingleUtil

class DedupKernelSpec extends AnyFunSuite {

  test("tokens replicates split-with-trailing-empties semantics") {
    assert(ShingleUtil.tokens("a b  c").toSeq === Seq("a", "b", "c"))
    assert(ShingleUtil.tokens(" a b").toSeq === Seq("", "a", "b"))
    assert(ShingleUtil.tokens("a b ").toSeq === Seq("a", "b", ""))
  }

  test("shingles are sliding n-grams, distinct, first-occurrence order") {
    val toks = "x y z x y z x".split(" ")
    val sh = ShingleUtil.shingles(toks, 3)
    assert(sh.toSeq === Seq("x y z", "y z x", "z x y"))
  }

  test("minhash signature is deterministic and within [0, 2^31-1)") {
    val a = Array(3L, 5L, 7L); val b = Array(11L, 13L, 17L)
    val hs = Array("x y z", "y z x").map(ShingleUtil.baseHash)
    val s1 = ShingleUtil.signature(hs, a, b)
    val s2 = ShingleUtil.signature(hs, a, b)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === 3)
    assert(s1.forall(v => v >= 0 && v < 2147483647L))
  }

  test("shingle-df cap drops hot-shingle pair blowup, keeps cold pairs") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // "the and of" is a stopword-grade shingle in 40 docs; "rare gram x"
    // is real dup evidence shared by docs 1 and 2
    val rows =
      (1L to 40L).map(id => (id, "the and of")) ++
      Seq((1L, "rare gram x"), (2L, "rare gram x"))
    val sh = rows.toDF("doc_id", "sh")
    val uncapped = Dedup.shinglePairCounts(sh, cap = 1000)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.size === 40 * 39 / 2, "uncapped emits all hot pairs")
    val capped = Dedup.shinglePairCounts(sh, cap = 10)
      .as[(Long, Long, Long)].collect().toSet
    // the hot shingle is dropped entirely; the rare-shingle pair survives
    assert(capped === Set((1L, 2L, 1L)))
    // quantified no-op guarantee at test scale: every real-corpus shingle
    // df (max 25 at sf0.1) is far below the production cap
    assert(Dedup.D02_DF_CAP === 1000)
  }

  test("near-identical shingle sets collide in at least one band") {
    // simulate a J≈0.97 pair: 64 shared shingles, 2 unique per side
    val shared = (1 to 64).map(i => s"sh$i shared gram")
    val d1 = (shared ++ Seq("only a x", "only a y")).toArray
    val d2 = (shared ++ Seq("only b x", "only b y")).toArray
    val rnd = new scala.util.Random(42)
    val a = Array.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(64)(rnd.nextInt(Int.MaxValue).toLong)
    val k1 = ShingleUtil.bandKeys(
      ShingleUtil.signature(d1.map(ShingleUtil.baseHash), a, b), 16, 4)
    val k2 = ShingleUtil.bandKeys(
      ShingleUtil.signature(d2.map(ShingleUtil.baseHash), a, b), 16, 4)
    assert(k1.zip(k2).exists { case (x, y) => x == y },
      "expected at least one shared LSH band for a J≈0.97 pair")
  }

  test("d10 SemDeDup dups are a strict subset of d05's exact dup set") {
    // cluster-then-compare scores the same cosine at the same threshold
    // over a SUBSET of the pair space (cluster-mates only), so every id
    // it flags must be the higher element of some exact d05 pair; what
    // it misses are exactly the cross-cluster pairs (the SemDeDup
    // paper's accepted approximation). This fixture is the hard regime —
    // d05's header documents no similarity gap at the 0.45 threshold —
    // so recall is partial by design; the subset direction is exact.
    val spark = graft.SparkTestSession.spark
    val dir = graft.SparkTestSession.sfDir
    val exact = graft.SparkEntry.queries("d05_dedup_embedding")(spark, dir)
      .select("id2").distinct().collect().map(_.getLong(0)).toSet
    val flagged = graft.SparkEntry.queries("d10_semdedup")(spark, dir)
      .where("is_dup = 1").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "d10 must flag at least one duplicate")
    assert(flagged.subsetOf(exact),
      s"d10 flagged non-duplicates: ${(flagged -- exact).toSeq.sorted}")
  }

  test("d12 sampled dup evidence ⊆ d09 exact; strong-dup recall holds") {
    // content-defined sampling keeps a gram CLASS in every document
    // alike, so a kept gram's df equals its exact df: every sampled
    // dup gram IS an exact dup gram (the subset direction is exact,
    // per document), and a document with many exact dup grams (a
    // copied span) is caught w.h.p. — a strong-dup doc with ≥ 20 dup
    // grams is missed with probability ≈ (3/4)^20 < 0.4%.
    val spark = graft.SparkTestSession.spark
    val dir = graft.SparkTestSession.sfDir
    def byDoc(name: String): Map[Long, (Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("doc_id", "n_grams", "n_dup_grams").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = byDoc("d09_substring_dedup")
    val sampled = byDoc("d12_substring_dedup_sampled")
    assert(sampled.nonEmpty && sampled.values.exists(_._2 > 0),
      "the sampled variant must find SOME duplicate evidence")
    // subset, per document: sampled counts never exceed exact counts,
    // and a sampled-flagged doc is exact-flagged
    sampled.foreach { case (id, (ng, nd)) =>
      val (eng, end) = exact(id)
      assert(ng <= eng && nd <= end,
        s"doc $id: sampled ($ng, $nd) exceeds exact ($eng, $end)")
      assert(nd == 0L || end > 0L)
    }
    // recall floor on the docs the method targets: strong duplicates
    // (≥ 20 exact dup grams — a copied span, not a single collision)
    val strong = exact.collect { case (id, (_, nd)) if nd >= 20 => id }
    val caught = strong.count(id =>
      sampled.get(id).exists(_._2 > 0))
    assert(strong.nonEmpty, "fixture must contain strong duplicates")
    assert(caught.toDouble / strong.size >= 0.9,
      s"strong-dup recall too low: $caught/${strong.size}")
  }

  test("d11's standing Bloom index prunes most batch band keys map-side") {
    // the whole point of the ingest shape: almost all batch keys die at
    // the (broadcast) membership probe, before ANY join — only genuine
    // band collisions plus the ~1% fpp survive to meet the corpus
    val spark = graft.SparkTestSession.spark
    val dir = graft.SparkTestSession.sfDir
    val (half, bloomBc, _) = Dedup.d11Stage(spark, dir)
    val keys = Dedup.minhashBuckets(spark, dir)
      .where(col("doc_id") >= half)
      .select(concat_ws(":", col("band"), col("bkey")).as("k"))
    val total = keys.count()
    val bc = bloomBc // local: the lambda must not capture the suite
    val surv = keys.where(
      udf((k: String) => bc.value.mightContainString(k)).apply(col("k")))
      .count()
    assert(total > 0)
    assert(surv < total / 5,
      s"Bloom should prune >80% of batch keys: $surv of $total survived")
  }
}
