package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Text-analysis kernels that need more than the DuckDB gate: the t08
  * two-phase (train → score) path, and the t07 run-length rewrite. */
class TextAnalysisSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("two-phase t08 (materialized model) equals the one-shot query") {
    // production shape: train once, score many — scoring the training
    // corpus against its own materialized model must reproduce the
    // stateless one-shot t08 exactly (same smoothing, same rounding)
    val modelDir = graft.util.Scratch.dir("graft-t08-model")
    TextAnalysis.t08TrainModel(spark, sfDir, modelDir)
    val twoPhase = TextAnalysis.t08ScoreWithModel(spark, sfDir, modelDir)
    val oneShot = graft.SparkEntry.queries("t08_lm_score")(spark, sfDir)
    assert(rows(twoPhase) === rows(oneShot))
  }

  test("two-phase t08 scores unseen bigrams by pure smoothing, not a drop") {
    // score a corpus the model never saw: every occurrence must still
    // score (n_bigrams preserved), via (c+1)/(c1+V) with zero counts
    val modelDir = graft.util.Scratch.dir("graft-t08-model2")
    TextAnalysis.t08TrainModel(spark, sfDir, modelDir)
    import spark.implicits._
    val alien = Seq((900001L, "zzqx wvut zzqx wvut zzqx"))
      .toDF("doc_id", "text")
    val staged = graft.util.Scratch.dir("graft-t08-alien")
    alien.write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val scored = TextAnalysis.t08ScoreWithModel(spark, staged, modelDir)
      .collect()
    assert(scored.length === 1)
    val r = scored.head
    assert(r.getAs[Long]("n_bigrams") === 4L)
    // all-unseen bigrams with unseen contexts: every term is ln(1/V) < 0
    assert(r.getAs[Double]("avg_logp") < 0.0)
  }

  test("t10 stratified sample balances strata and is reproducible") {
    val df = graft.SparkEntry.queries("t10_stratified_sample")(spark, sfDir)
    val kept = df.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = graft.Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = full.values.min
    // every stratum lands within ±15% of the smallest stratum's size
    // (the Lehmer residues equidistribute but are not exact quotas)
    kept.foreach { case (lang, n) =>
      assert(n <= full(lang), s"$lang kept more than it has")
      assert(math.abs(n - target.toDouble) / target < 0.15,
        s"$lang kept $n vs target $target")
    }
    // pure function of doc_id → the same documents every run
    assert(rows(df) === rows(
      graft.SparkEntry.queries("t10_stratified_sample")(spark, sfDir)))
  }

  test("t11 detects exactly the planted PII classes per doc") {
    val got = graft.SparkEntry.queries("t11_pii_redaction")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"))).toMap
    got.foreach { case (id, (ne, np)) =>
      assert(ne === (if (id % 4 != 0) 1 else 0), s"doc $id emails")
      assert(np === (if (id % 3 != 0) 1 else 0), s"doc $id phones")
    }
    // redaction must remove every match: re-detecting on redacted text
    // is impossible here (fp only), but fps must differ whenever
    // something was planted and collide with nothing else
    val fps = graft.SparkEntry.queries("t11_pii_redaction")(spark, sfDir)
      .select(col("redacted_fp")).collect().map(_.getString(0))
    assert(fps.toSet.size === fps.length, "redacted fps collide")
  }

  test("t12 packing is a gapless global token layout") {
    val rs = graft.SparkEntry.queries("t12_sequence_packing")(spark, sfDir)
      .orderBy(col("doc_id")).collect()
    var expectedStart = 0L
    rs.foreach { r =>
      val (id, n, start) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("tok_start"))
      assert(start === expectedStart,
        s"doc $id starts at $start, expected $expectedStart (gap/overlap)")
      assert(r.getAs[Long]("first_chunk") === start / 512, s"doc $id first")
      assert(r.getAs[Long]("last_chunk") === (start + n - 1) / 512,
        s"doc $id last")
      expectedStart += n
    }
  }

  test("t12's big window is partitioned by shard, not a global sort") {
    // the whole point of the two-phase prefix sum: the full-data Window
    // must carry a partition spec (parallel); only the ≤32-row shard
    // base offsets may run single-partition
    val plan = graft.SparkEntry.queries("t12_sequence_packing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    // the full-data window partitions by shard AND orders by doc_id;
    // the tiny shard-base window orders by shard only — so a line with
    // both columns is specifically the partitioned one
    assert(windows.exists(w => w.contains("shard") && w.contains("doc_id")),
      s"expected a shard-partitioned window over doc_id in:\n$plan")
  }

  test("t12 runs one corpus shuffle: AQE reuses the shard exchange") {
    // both prefix-sum branches consume the SAME shard exchange (scan +
    // tokenize + shuffle write happen once); `shard` is built non-null
    // so no branch-asymmetric isnotnull inference breaks canonical
    // equality. Runtime-only: AQE applies exchange reuse during
    // execution, so the assertion needs the finalized adaptive plan.
    val qe = graft.SparkEntry.queries("t12_sequence_packing")(spark, sfDir)
      .queryExecution
    qe.executedPlan.executeCollect()
    val finalPlan = qe.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the shard exchange to be reused in:\n$finalPlan")
  }

  test("t07 top-token count (sorted run-length fold) matches brute force") {
    // the one-pass rewrite of the quadratic distinct×filter shape must
    // agree with a plain Scala count on every fixture document
    val got = graft.SparkEntry.queries("t07_repetition")(spark, sfDir)
      .select(col("doc_id"), col("n_tok"), col("top_tok_frac"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val expected = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map { r =>
        // limit -1 mirrors Spark's split (trailing empties kept)
        val tk = r.getString(1).split("\\s+", -1)
        val top = tk.groupBy(identity).values.map(_.length).max
        r.getLong(0) -> (tk.length.toLong, top.toDouble / tk.length)
      }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, frac)) =>
      val (en, efrac) = expected(id)
      assert(n === en, s"doc $id token count")
      assert(math.abs(frac - efrac) < 1e-12, s"doc $id top_tok_frac")
    }
  }

  test("t13 importance weights rank target-source docs above the rest") {
    // DSIR's whole claim: docs drawn from the target distribution get
    // higher mean log-ratio than the rest of the corpus. The hashed
    // model must recover source membership it was never told about at
    // the doc level (the oracle pins values; this pins the semantics).
    val scores = graft.SparkEntry.queries("t13_dsir_importance")(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    assert(scores.count() === docs.count(), "every document is scored")
    val byGroup = scores.join(docs, "doc_id")
      .groupBy(col("source").isin("src0", "src1", "src2", "src3")
        .as("is_target"))
      .agg(avg(col("dsir_score")).as("s"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byGroup(true) > byGroup(false) + 0.01,
      s"target ${byGroup(true)} must clearly exceed raw ${byGroup(false)}")
  }

  test("t15 staged DSIR scoring equals the one-shot t13") {
    // the t09 lesson applied to importance weighting: scoring against
    // the materialized bucket model must reproduce the stateless
    // one-shot exactly (same smoothing, same decimal rounding)
    val staged = graft.SparkEntry.queries("t15_dsir_pretrained")(spark, sfDir)
    val oneShot = graft.SparkEntry.queries("t13_dsir_importance")(spark, sfDir)
    assert(rows(staged) === rows(oneShot))
  }

  test("t14 verdict: keep is the conjunction and rules discriminate") {
    val v = graft.SparkEntry.queries("t14_filter_verdict")(spark, sfDir)
      .collect()
    assert(v.nonEmpty)
    v.foreach { r =>
      val flags = Seq("r_len", "r_wordlen", "r_stop", "r_toptok", "r_dup3")
        .map(f => r.getInt(r.fieldIndex(f)))
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getInt(r.fieldIndex("keep")) === flags.product,
        s"keep must be the AND of the rule flags for doc ${r.get(0)}")
    }
    // the verdict must actually split the fixture — an all-pass (or
    // all-fail) filter tests nothing
    val kept = v.count(_.getInt(v.head.fieldIndex("keep")) == 1)
    assert(kept > 0 && kept < v.length,
      s"$kept/${v.length} kept — thresholds no longer discriminate")
  }

  test("t14 short documents are vacuously clean on the trigram rule") {
    // < 3 tokens ⇒ no trigrams; the guarded branch must neither throw
    // (Spark's descending sequence + slice(tk, 0, _) under ANSI) nor
    // mark the doc dirty
    import spark.implicits._
    val tiny = Seq((1L, "one two", "srcX"), (2L, "one", "srcX"))
      .toDF("doc_id", "text", "source")
    val staged = graft.util.Scratch.dir("graft-t14-tiny")
    tiny.write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val v = graft.SparkEntry.queries("t14_filter_verdict")(spark, staged)
      .collect().map(r => r.getLong(0) ->
        r.getInt(r.fieldIndex("r_dup3"))).toMap
    assert(v === Map(1L -> 1, 2L -> 1))
  }
}
