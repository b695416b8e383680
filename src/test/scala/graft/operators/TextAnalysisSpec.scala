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
}
