package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._

/** End-to-end corpus curation: the individual LLM-pipeline operators
  * (quality scoring, exact dedup, decontamination) composed into the
  * single pass a training-data build actually runs. The point of the
  * module is pipeline CLOSURE — each stage consumes the previous
  * stage's survivors, so the stage costs shrink monotonically and the
  * oracle checks the composition, not just the parts.
  *
  * Stage order is the production order (cheapest-first):
  *   1. quality gate — per-row integer predicate, pushed to the scan
  *      pass; no shuffle. Uses t02's composite quality at θ = 0.6,
  *      evaluated as 128u + 96(n−s) + 12·min(8n, c) ≥ 192n — all
  *      integers, so the cut is bit-identical across engines.
  *   2. exact dedup — keep the min doc_id per normalized fingerprint
  *      (d01's machinery) over stage-1 survivors only: one shuffle on
  *      a 32-byte key, never on raw text.
  *   3. decontamination — drop survivors sharing an 8-gram with the
  *      eval set (d08: doc_id < 10 plays the benchmark), and the eval
  *      docs themselves. Benchmark shingles come from the FULL corpus
  *      (an eval doc that failed quality still contaminates) and are
  *      broadcast; only stage-2 survivors are shingled for checking.
  *
  * 100 TB shape: stage 1 is a codegen filter on the scan; stage 2
  * shuffles fingerprints of survivors only; stage 3 shingles survivors
  * only and joins against a broadcast eval-gram set, then anti-joins
  * the (small) contaminated-id set back on doc_id. No stage touches
  * rows a previous stage dropped.
  */
object Pipeline {

  private val QUALITY_PCT = 60 // θ = 0.60 of t02's composite quality
  private val DECON_N = 8
  private val BENCH_DOCS = 10L

  private def p01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)

    // stage 1 — quality gate (integer form of qualityScore ≥ 0.60:
    // numerator ≥ (60/100)·320n = 192n)
    val n = tokenCount(col("text")).cast(LongType)
    val u = uniqTokenCount(col("text")).cast(LongType)
    val s = tokensIn(col("text"), enStop).cast(LongType)
    val c = charCountNoSpace(col("text")).cast(LongType)
    val num = lit(128L) * u + lit(96L) * (n - s) +
      lit(12L) * least(lit(8L) * n, c)
    val q = docs.where(num * 100L >= lit(320L * QUALITY_PCT) * n)

    // stage 2 — exact dedup, keep-min per normalized fingerprint
    val keep = q.groupBy(normFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    val surv = q.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")

    // stage 3 — decontamination of the survivors
    def grams(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val toks = Dedup.ShingleUtil.tokens(text)
          if (toks.length < DECON_N) Iterator.empty
          else Dedup.ShingleUtil.shingles(toks, DECON_N).iterator
            .map(sh => (id, sh))
        }.toDF("doc_id", "sh")
    val bench = grams(docs.where(col("doc_id") < BENCH_DOCS))
      .select(col("sh")).distinct()
    val contaminated = grams(surv.where(col("doc_id") >= BENCH_DOCS))
      .join(broadcast(bench), Seq("sh"))
      .select(col("doc_id")).distinct()
    surv.where(col("doc_id") >= BENCH_DOCS)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  private val p01Sql =
    s"""WITH t AS (
       |  SELECT doc_id, lang, source, text,
       |    string_split_regex(text, '\\s+') AS tk FROM documents),
       |q AS (
       |  SELECT * FROM t WHERE
       |    (128 * len(list_distinct(tk))
       |     + 96 * (len(tk) - len(list_filter(tk,
       |         x -> x IN ('the','a','of','and','to','in','is'))))
       |     + 12 * least(8 * len(tk),
       |         length(regexp_replace(text, '\\s', '', 'g')))) * 100
       |    >= ${320 * QUALITY_PCT} * len(tk)),
       |k AS (
       |  SELECT min(doc_id) AS doc_id FROM q
       |  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
       |surv AS (SELECT q.doc_id, q.lang, q.source, q.tk
       |         FROM q JOIN k USING (doc_id)),
       |bench AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    generate_series(1, len(tk) - ${DECON_N - 1}),
       |    i -> array_to_string(tk[i:i+${DECON_N - 1}], ' ')))) AS sh
       |  FROM t WHERE doc_id < $BENCH_DOCS AND len(tk) >= $DECON_N),
       |hits AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(
       |      generate_series(1, len(tk) - ${DECON_N - 1}),
       |      i -> array_to_string(tk[i:i+${DECON_N - 1}], ' ')))) AS sh
       |    FROM surv WHERE doc_id >= $BENCH_DOCS AND len(tk) >= $DECON_N) g
       |  JOIN bench USING (sh))
       |SELECT doc_id, lang, source FROM surv
       |WHERE doc_id >= $BENCH_DOCS
       |  AND doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("p01_clean_corpus", p01, Some(p01Sql)))
}
