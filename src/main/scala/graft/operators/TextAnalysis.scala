package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operator surface over the `documents` table: token
  * statistics, quality scoring, language identification and document
  * fingerprinting (SURVEY.md §2.2 north-star extensions).
  *
  * All per-document — embarrassingly parallel, no shuffles; at 100 TB
  * these run as a single WholeStageCodegen pass over the scan.
  */
object TextAnalysis {

  // t01 — token counting (whitespace + BPE-ish regex + distinct)
  private def t01(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("ws_tokens"),
      bpeTokenCount(col("text")).as("bpe_tokens"),
      uniqTokenCount(col("text")).as("uniq_tokens"),
      length(col("text")).as("text_chars"),
      col("n_chars"))

  private val t01Sql =
    """SELECT doc_id,
      |  len(string_split_regex(text, '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
      |  len(list_distinct(string_split_regex(text, '\s+'))) AS uniq_tokens,
      |  length(text) AS text_chars,
      |  n_chars
      |FROM documents""".stripMargin

  // t02 — quality scoring (diversity, stopword, token-length signals)
  private def t02(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tok"),
      uniqRatio(col("text")).as("uniq_ratio"),
      stopwordRatio(col("text")).as("stop_ratio"),
      avgTokenLen(col("text")).as("avg_tok_len"),
      punctCount(col("text")).as("punct_cnt"),
      qualityScore(col("text")).as("quality"))

  private val t02Sql =
    """SELECT doc_id, source,
      |  len(string_split_regex(text, '\s+')) AS n_tok,
      |  CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE) / len(string_split_regex(text, '\s+')) AS uniq_ratio,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(string_split_regex(text, '\s+')) AS stop_ratio,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(string_split_regex(text, '\s+')) AS avg_tok_len,
      |  length(regexp_replace(text, '[\w\s]', '', 'g')) AS punct_cnt,
      |  CAST(128 * len(list_distinct(string_split_regex(text, '\s+')))
      |     + 96 * (len(string_split_regex(text, '\s+')) - len(list_filter(string_split_regex(text, '\s+'), t -> t IN ('the','a','of','and','to','in','is'))))
      |     + 12 * least(8 * len(string_split_regex(text, '\s+')), length(regexp_replace(text, '\s', '', 'g')))
      |    AS DOUBLE) / (320 * len(string_split_regex(text, '\s+'))) AS quality
      |FROM documents""".stripMargin

  // t03 — language-ID confusion matrix: labeled lang × n-gram-marker guess
  private def t03(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), langGuess(col("text")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))

  private val t03Sql = {
    def score(words: String) =
      s"len(list_filter(string_split_regex(text, '\\s+'), t -> t IN ($words)))"
    val de = score("'der','die','und','ist','nicht'")
    val en = score("'the','a','of','and','to'")
    val es = score("'el','la','de','que','y'")
    val fr = score("'le','les','et','est','une'")
    val cjk = "length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g'))"
    s"""SELECT lang, lang_guess, COUNT(*) AS n FROM (
       |  SELECT lang,
       |    CASE WHEN $cjk > 0 THEN 'zh'
       |         WHEN $de >= $en AND $de >= $es AND $de >= $fr THEN 'de'
       |         WHEN $en >= $es AND $en >= $fr THEN 'en'
       |         WHEN $es >= $fr THEN 'es'
       |         ELSE 'fr' END AS lang_guess
       |  FROM documents) t
       |GROUP BY lang, lang_guess""".stripMargin
  }

  // t04 — document fingerprinting (exact + normalization-robust)
  private def t04(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      normFingerprint(col("text")).as("fp_norm"))

  private val t04Sql =
    """SELECT doc_id,
      |  md5(text) AS fp,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_norm
      |FROM documents""".stripMargin

  // t05 — TF-IDF term statistics (corpus-level df via one extra shuffle;
  // tf/df/n are exact ints, tfidf is a rounded derived double)
  private def t05(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // corpus size: one scalar, cached per dir — it feeds the idf VALUES,
    // which is safe only because fixture dirs are immutable within a JVM
    // (the cachedCount contract)
    val n = Tables.cachedCount(spark, dir, "documents")
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(df, "word")
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 4).as("tfidf"))
  }

  private val t05Sql =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
      |  FROM documents),
      |t AS (SELECT doc_id, word FROM terms WHERE length(word) > 0),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM t) GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
      |SELECT doc_id, word, tf, df,
      |  round(tf * ln(n / df), 4) AS tfidf
      |FROM tf JOIN df USING (word), n""".stripMargin

  // t06 — bigram frequencies (n-gram language modeling stats)
  private def t06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (_, text) =>
        Dedup.ShingleUtil.tokens(text).iterator.sliding(2).withPartial(false)
          .map(_.mkString(" "))
      }
      .toDF("bigram")
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 5)
  }

  private val t06Sql =
    """SELECT bigram, COUNT(*) AS cnt FROM (
      |  SELECT array_to_string(tk[i:i+1], ' ') AS bigram
      |  FROM (SELECT string_split_regex(text, '\s+') AS tk FROM documents) t,
      |       LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) s) b
      |GROUP BY bigram HAVING COUNT(*) >= 5""".stripMargin

  // t07 — repetition signals (the Gopher-rule family: a document whose
  // mass concentrates in one token, or whose n-grams repeat, is
  // boilerplate/spam). top_tok_frac = most-frequent-token share;
  // dup_trigram_frac = share of trigram OCCURRENCES that are repeats of
  // an earlier trigram. Per-document higher-order functions only — no
  // shuffle, one codegen pass over the scan at any scale.
  /** most-frequent-token count via sort + longest-equal-run fold:
    * O(n log n) per document, one pass over the sorted array. (The
    * round-5 shape — size(filter(tk, ...)) per DISTINCT token — was
    * O(n_tok × n_distinct) per document, quadratic exactly on the
    * long repetitive documents the Gopher-style filters target.)
    * Accumulator: (prev token, current run, best run); x === null prev
    * is NULL, so the first element falls through to run = 1. Shared by
    * t07 (repetition signals) and t14 (composite filter verdict). */
  private def topTokenCount(tk: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.types.IntegerType
    aggregate(
      array_sort(tk),
      struct(lit(null).cast("string").as("prev"),
             lit(0).cast(IntegerType).as("run"),
             lit(0).cast(IntegerType).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
               greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  private def t07(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val tk = split(col("text"), "\\s+")
    val nTok = size(tk)
    val topCnt = topTokenCount(tk)
    val triTotal = nTok - lit(2)
    val triDistinct = size(array_distinct(transform(
      sequence(lit(1), triTotal),
      i => array_join(slice(tk, i, lit(3)), " "))))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTok.cast(LongType).as("n_tok"),
      (topCnt.cast(DoubleType) / nTok).as("top_tok_frac"),
      when(nTok >= 3,
        lit(1.0) - triDistinct.cast(DoubleType) / triTotal)
        .otherwise(0.0).as("dup_trigram_frac"))
  }

  private val t07Sql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents)
      |SELECT doc_id,
      |  len(tk) AS n_tok,
      |  CAST(list_max(list_transform(list_distinct(tk),
      |    u -> len(list_filter(tk, x -> x = u)))) AS DOUBLE) / len(tk)
      |    AS top_tok_frac,
      |  CASE WHEN len(tk) >= 3 THEN
      |    1.0 - CAST(len(list_distinct(list_transform(
      |      generate_series(1, len(tk) - 2),
      |      i -> array_to_string(tk[i:i+2], ' ')))) AS DOUBLE) / (len(tk) - 2)
      |  ELSE 0.0 END AS dup_trigram_frac
      |FROM t""".stripMargin

  // t08 — bigram-LM quality score (the CCNet/KenLM-style perplexity
  // filter): train add-one-smoothed bigram probabilities on the corpus
  // itself, then score every document by its average log-probability —
  // low scores mark text the corpus LM finds surprising (gibberish,
  // boilerplate in the wrong language, OCR noise). Corpus-model build =
  // two count shuffles; scoring = one join on the bigram + one per-doc
  // aggregation — all hash-partitioned, no driver state.
  //
  // Determinism: a per-doc SUM of double log-probs depends on partition
  // fold order, so each term is rounded to 8 decimals and summed as
  // DECIMAL (exact, order-independent — the q01 pattern); only the final
  // per-doc average returns to double.
  /** bigram OCCURRENCES (not distinct): every adjacent pair scores.
    * Shared by the one-shot t08 (model + scoring from the same corpus)
    * and the two-phase train/score pair below. */
  private def t08Occ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .where(size(col("tk")) >= 2)
      .as[(Long, Seq[String])]
      .flatMap { case (id, tk) =>
        tk.iterator.sliding(2).withPartial(false)
          .map(p => (id, p.head, p.head + " " + p.last))
      }.toDF("doc_id", "w1", "bigram")
  }

  /** Score bigram occurrences against an (bg = bigram→c2, ug = w1→c1)
    * add-one-smoothed model. vocab = |model contexts| = ug's row count,
    * computed IN the query as a broadcast scalar (round-5 advisor: the
    * eager distinct().count() at construction time ran two corpus scans
    * for any caller that only wanted the plan). LEFT joins + coalesce:
    * a bigram the model never saw scores (0+1)/(0+V) — the smoothing's
    * whole point — so a corpus ≠ training corpus still scores; on the
    * training corpus itself every key matches and the joins behave as
    * inner. Per-doc log-prob terms are rounded to 8 decimals and summed
    * as DECIMAL (exact, partition-order-independent — the q01 pattern). */
  private def t08Score(occ: DataFrame, bg: DataFrame,
                       ug: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val vocabDf = ug.agg(count(lit(1)).as("vocab"))
    val logp = round(
      log((coalesce(col("c2"), lit(0L)) + 1).cast(DoubleType) /
          (coalesce(col("c1"), lit(0L)) + col("vocab"))), 8)
      .cast(DecimalType(18, 8))
    occ.join(bg, Seq("bigram"), "left").join(ug, Seq("w1"), "left")
      .crossJoin(broadcast(vocabDf))
      .groupBy(col("doc_id"))
      // cast the exact decimal sum to double BEFORE dividing: decimal
      // division precision/scale rules differ between engines, double
      // division does not
      .agg(count(lit(1)).as("n_bigrams"),
           (sum(logp).cast(DoubleType) / count(lit(1))).as("avg_logp"))
  }

  private def t08(spark: SparkSession, dir: String): DataFrame = {
    // one-shot, stateless: model counts AND the scoring join all derive
    // from occ (Catalyst reuses the ug shuffle for the vocab scalar via
    // ReusedExchange). A production pipeline materializes the model
    // once instead — that path is t08TrainModel/t08ScoreWithModel.
    val occ = t08Occ(spark, dir)
    t08Score(occ,
      occ.groupBy(col("bigram")).agg(count(lit(1)).as("c2")),
      occ.groupBy(col("w1")).agg(count(lit(1)).as("c1")))
  }

  /** t08, two-phase (the shape CCNet actually runs): phase 1 trains the
    * bigram LM once and materializes it as parquet model tables; phase 2
    * scores any corpus against them with ONE scan of that corpus's
    * bigram occurrences (the one-shot query recomputes occ three times
    * to stay stateless). TextAnalysisSpec pins score(train corpus) ≡
    * the one-shot t08. */
  def t08TrainModel(spark: SparkSession, dir: String,
                    modelDir: String): Unit = {
    val occ = t08Occ(spark, dir)
    occ.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
      .write.mode("overwrite").parquet(s"$modelDir/bigrams")
    occ.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      .write.mode("overwrite").parquet(s"$modelDir/unigrams")
  }

  def t08ScoreWithModel(spark: SparkSession, dir: String,
                        modelDir: String): DataFrame =
    t08Score(t08Occ(spark, dir),
      spark.read.parquet(s"$modelDir/bigrams"),
      spark.read.parquet(s"$modelDir/unigrams"))

  // dir → model dir already trained in this JVM (the x09 staging pattern)
  private val t08Models =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Train the t09 model ONCE per (JVM, corpus dir) and return its
    * location. Model tables are train-once-score-many infrastructure, so
    * the gated t09 times what a production scoring run costs — one scan
    * of the corpus's occurrences against a standing model — not a
    * retrain. Bench warms this explicitly, mirroring x09's staging. */
  private[graft] def t09Stage(spark: SparkSession, dir: String): String =
    t08Models.computeIfAbsent(dir, _ => {
      val d = graft.util.Scratch.dir("graft-t08-model")
      t08TrainModel(spark, dir, d)
      d
    })

  /** t09 — the two-phase path as a GATED query: scores the corpus
    * against its own pre-trained model. Output ≡ t08 (spec-pinned and
    * oracle-checked with t08's own SQL); what differs is the cost shape
    * the bench observes — one occ scan instead of three. */
  private def t09(spark: SparkSession, dir: String): DataFrame =
    t08ScoreWithModel(spark, dir, t09Stage(spark, dir))

  private val t08Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
      |occ AS (
      |  SELECT doc_id, tk[i] AS w1, tk[i] || ' ' || tk[i+1] AS bigram
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i)
      |  WHERE len(tk) >= 2),
      |bg AS (SELECT bigram, COUNT(*) AS c2 FROM occ GROUP BY 1),
      |ug AS (SELECT w1, COUNT(*) AS c1 FROM occ GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT w1) AS vocab FROM occ)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(CAST(round(ln(CAST(c2 + 1 AS DOUBLE) / (c1 + vocab)), 8)
      |               AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_logp
      |FROM occ JOIN bg USING (bigram) JOIN ug USING (w1), v
      |GROUP BY doc_id""".stripMargin

  // t10 — deterministic stratified downsampling: rebalance the corpus so
  // every language stratum lands at ~the size of the smallest one (the
  // standard multilingual-pretraining rebalance step). The keep decision
  // is a pure function of doc_id — bucket = (doc_id·4243 + 17) mod 9973,
  // a full-period Lehmer-style map whose step wraps the modulus every
  // ~2.35 ids, so residues of ANY id subset equidistribute over [0, p)
  // (a multiplier smaller than p degenerates: 100003 mod 99991 = 12
  // keeps consecutive ids' buckets tiny and filters nothing) — compared
  // entirely in integers (bucket·cnt < target·9973 ⟺ bucket/9973 <
  // target/cnt), so there is no float threshold to flip between engines
  // and a re-run selects the SAME documents (reproducible). At 100 TB
  // the per-stratum counts are a broadcast scalar map and the filter is
  // one codegen pass over the scan: no shuffle of the corpus at all.
  // (Production would swap the affine residue for a 64-bit splittable
  // hash of a stable key; the residue keeps the oracle portable.)
  private def t10(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val target = cnts.agg(min(col("cnt")).as("target"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(cnts), Seq("lang"))
      .crossJoin(broadcast(target))
      .where(pmod(col("doc_id") * lit(4243L) + lit(17L), lit(9973L)) *
               col("cnt") < col("target") * lit(9973L))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  private val t10Sql =
    """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      |t AS (SELECT MIN(cnt) AS target FROM c)
      |SELECT doc_id, lang, source
      |FROM documents JOIN c USING (lang), t
      |WHERE ((doc_id * 4243 + 17) % 9973) * cnt < target * 9973""".stripMargin

  // t11 — PII detection/redaction. The synthetic corpus carries no PII
  // (not even a digit), so the query first plants deterministic contact
  // lines derived from doc_id, then detects and redacts them — the
  // regex machinery (what a Presidio-style scrubber runs at scale) is
  // real; the planted line is the fixture, same honesty contract as
  // m02's stubbed codec. Patterns stay in the Java-regex ∩ RE2 common
  // subset (char classes, bounded repeats — no lookaround) so the
  // DuckDB oracle runs the literally-same pattern. Per-row regex only:
  // zero shuffle, one codegen pass at any scale.
  private val EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PHONE_RE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  private def t11(spark: SparkSession, dir: String): DataFrame = {
    // vary the planted classes per doc (¾ get an email, ⅔ a phone) so
    // the detector's counts and redactions aren't corpus constants
    val enriched = concat(col("text"),
      when(pmod(col("doc_id"), lit(4L)) =!= 0L,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(""),
      when(pmod(col("doc_id"), lit(3L)) =!= 0L,
        concat(lit(" call +1-202-555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
        .otherwise(""))
    val redacted = regexp_replace(
      regexp_replace(enriched, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      regexp_count(enriched, lit(EMAIL_RE)).as("n_emails"),
      regexp_count(enriched, lit(PHONE_RE)).as("n_phones"),
      md5(redacted).as("redacted_fp"))
  }

  private val t11Sql =
    s"""WITH e AS (
       |  SELECT doc_id,
       |    text
       |    || CASE WHEN doc_id % 4 <> 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 3 <> 0
       |         THEN ' call +1-202-555-'
       |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END AS enriched
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(enriched, '$EMAIL_RE')) AS n_emails,
       |  len(regexp_extract_all(enriched, '$PHONE_RE')) AS n_phones,
       |  md5(regexp_replace(regexp_replace(enriched, '$EMAIL_RE', '<EMAIL>', 'g'),
       |      '$PHONE_RE', '<PHONE>', 'g')) AS redacted_fp
       |FROM e""".stripMargin

  // t12 — concat-and-chunk sequence packing: the LLM-pretraining step
  // that concatenates the tokenized corpus in a deterministic order and
  // cuts it every SEQ_LEN tokens into training sequences (documents
  // straddle cut points — GPT-style packing, no padding). Each document
  // needs its GLOBAL token offset: a prefix sum over the whole corpus.
  //
  // Scale shape: a naive `SUM() OVER (ORDER BY doc_id)` funnels 100 TB
  // through ONE partition (Exchange SinglePartition + global sort) — the
  // classic window-function scale trap. This runs the textbook
  // distributed prefix sum instead: order-preserving range shards
  // (shard = ⌊doc_id·S/(max+1)⌋, monotone in doc_id) → per-shard local
  // cumsum (Window PARTITIONED by shard: parallel) → the S shard totals
  // collapse to one tiny single-partition window → broadcast the shard
  // base offsets back. The only single-partition work is over S rows.
  // The oracle is the naive global-window formulation — proving the
  // two-phase plan computes exactly the single-sequence semantics.
  private val SEQ_LEN = 512L
  private val PACK_SHARDS = 32L

  private def t12(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"))
    val bounds = docs.agg(max(col("doc_id")).as("max_id"))
    // coalesce makes `shard` provably non-nullable: otherwise the final
    // join infers isnotnull(shard) into ONE branch's subtree, the two
    // shard exchanges stop being canonically equal, and ReuseExchange
    // cannot collapse them — observed as a second full scan + tokenize
    // + shuffle of the corpus (-1 is unreachable: doc_id ≥ 0)
    val sharded = docs.crossJoin(broadcast(bounds))
      .withColumn("shard",
        coalesce(expr(s"(doc_id * $PACK_SHARDS) div (max_id + 1)"),
          lit(-1L)))
      .drop("max_id")
    val localW = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("local_before",
      coalesce(sum(col("n_tok")).over(localW), lit(0L)))
    // shard base offsets: exclusive running sum over the S shard totals
    // (single-partition window over ≤ PACK_SHARDS rows — trivially
    // small). Derived from `local`, not `sharded`: the inclusive prefix
    // local_before + n_tok is monotone within a shard, so its max IS the
    // shard total — and because both consumers then sit above the SAME
    // shard exchange, ReuseExchange collapses them to one corpus scan,
    // one tokenize pass, one shuffle write (a groupBy on `sharded`
    // pushes a partial aggregate below its exchange, which makes the
    // two exchanges structurally different and re-plans the scan twice).
    val baseW = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy(col("shard"))
      .agg(max(col("local_before") + col("n_tok")).as("shard_total"))
      .withColumn("shard_base",
        coalesce(sum(col("shard_total")).over(baseW), lit(0L)))
      .select(col("shard"), col("shard_base"))
    local.join(broadcast(bases), Seq("shard"))
      .withColumn("tok_start", col("shard_base") + col("local_before"))
      .select(col("doc_id"), col("n_tok"), col("tok_start"),
        expr(s"tok_start div $SEQ_LEN").as("first_chunk"),
        expr(s"(tok_start + n_tok - 1) div $SEQ_LEN").as("last_chunk"))
  }

  private val t12Sql =
    s"""WITH d AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tok
       |  FROM documents),
       |c AS (
       |  -- CAST: DuckDB's windowed SUM(BIGINT) is HUGEINT → pandas
       |  -- float64, which breaks the driver's stringified value hash
       |  SELECT doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tok_start
       |  FROM d)
       |SELECT doc_id, n_tok, tok_start,
       |  CAST(tok_start // $SEQ_LEN AS BIGINT) AS first_chunk,
       |  CAST((tok_start + n_tok - 1) // $SEQ_LEN AS BIGINT) AS last_chunk
       |FROM c""".stripMargin

  // t13 — DSIR-style importance weighting (Xie et al., "Data Selection
  // for Language Models via Importance Resampling", NeurIPS 2023): score
  // every document by how much it resembles a TARGET distribution
  // relative to the raw corpus, using hashed n-gram features. Features =
  // unigrams + bigrams hashed into DSIR_B buckets (the paper's hashed
  // n-gram generative model); per-bucket probabilities are add-one
  // smoothed on target and raw; a document's weight is the mean
  // log-ratio log(p_target/p_raw) over its feature occurrences. Target
  // here = the "curated" sources (src0-src3) — the pretraining use case
  // scores a web crawl against Wikipedia/books and keeps the top mass.
  //
  // Cross-engine hash: bucket = first 15 md5 hex chars as int, mod
  // DSIR_B (the d04 oracle idiom) — both engines hash identically, so
  // the oracle checks values, not just shapes.
  //
  // Scale shape: the corpus text never shuffles. The feature stream is
  // a narrow explode; the two count aggregations exchange ≤ tasks·B
  // pre-combined rows into B-row model tables, which re-join the stream
  // BROADCAST; the per-doc mean exchanges one partial row per (task,
  // doc). Like t08, the stateless one-shot pays 3 feature-stream passes
  // (target counts, raw counts, scoring) — the materialize-the-model
  // variant that avoids that is the t09 staging pattern.
  //
  // PREFER t15 (`t15_dsir_pretrained`) as the default: it scores in ONE
  // corpus pass against the staged bucket model (~1.8× faster here,
  // and the only shape that makes sense at 100 TB, where the model is
  // trained once and every ingestion batch scores against it). t13
  // stays gated as the stateless re-derivation that double-checks t15. Determinism:
  // log-ratio terms round to 8 decimals and sum as DECIMAL (the q01 /
  // t08 pattern — partition-order-independent).
  private val DSIR_B = 1024L
  private val DSIR_TARGET = Seq("src0", "src1", "src2", "src3")

  private def t13Feats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
              split(col("text"), "\\s+").as("tk"))
    val bigrams = zip_with(
      slice(col("tk"), lit(1), size(col("tk")) - 1),
      slice(col("tk"), lit(2), size(col("tk")) - 1),
      (a, b) => concat(a, lit(" "), b))
    docs.select(col("doc_id"), col("source"),
        explode(concat(col("tk"), bigrams)).as("feat"))
      .withColumn("bucket",
        conv(substring(md5(col("feat")), 1, 15), 16, 10)
          .cast(LongType) % DSIR_B)
      .drop("feat")
  }

  /** the DSIR bucket model (bucket → logratio) as a standalone frame —
    * shared by the one-shot t13 and the staged t15 train phase */
  private def t13Model(feats: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val raw = feats.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgt = feats.where(col("source").isin(DSIR_TARGET: _*))
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    // corpus totals fold the B-row count tables, not the corpus again
    val tot = raw.agg(sum(col("cr")).as("nr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("nt")))
    raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + 1).cast(DoubleType) /
            (col("nt") + DSIR_B)) /
          ((col("cr") + 1).cast(DoubleType) / (col("nr") + DSIR_B))), 8)
          .cast(DecimalType(18, 8)).as("logratio"))
  }

  /** score a corpus's feature stream against a (bucket, logratio)
    * model — ONE feature pass */
  private def t13Score(feats: DataFrame, model: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    feats.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
           (sum(col("logratio")).cast(DoubleType) / count(lit(1)))
             .as("dsir_score"))
  }

  private def t13(spark: SparkSession, dir: String): DataFrame = {
    val feats = t13Feats(spark, dir)
    t13Score(feats, t13Model(feats))
  }

  // dir → DSIR model dir already trained in this JVM (the t09 pattern)
  private val t13Models =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Train the DSIR bucket model ONCE per (JVM, corpus dir) and
    * materialize it as a parquet table. Importance models are
    * train-once-score-many infrastructure (DSIR scores a new crawl
    * against a standing target/raw model), so the gated t15 times a
    * production scoring run — one feature pass — not a retrain. */
  private[graft] def t15Stage(spark: SparkSession, dir: String): String =
    t13Models.computeIfAbsent(dir, _ => {
      val d = graft.util.Scratch.dir("graft-t13-model")
      t13Model(t13Feats(spark, dir)).write.mode("overwrite")
        .parquet(s"$d/buckets")
      d
    })

  /** t15 — the staged DSIR path as a GATED query: scores the corpus
    * against its own pre-trained bucket model. Output ≡ t13
    * (oracle-checked with t13's own SQL); the cost shape the bench
    * observes is one feature pass instead of three. */
  private def t15(spark: SparkSession, dir: String): DataFrame =
    t13Score(t13Feats(spark, dir),
      spark.read.parquet(s"${t15Stage(spark, dir)}/buckets"))

  private val t13Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split_regex(text, '\\s+') AS tk
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, source,
       |    CAST(concat('0x', substring(md5(feat), 1, 15)) AS BIGINT)
       |      % $DSIR_B AS bucket
       |  FROM toks, LATERAL (SELECT unnest(list_concat(tk,
       |    list_transform(generate_series(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1]))) AS feat)),
       |raw AS (SELECT bucket, COUNT(*) AS cr FROM f GROUP BY 1),
       |tgt AS (SELECT bucket, COUNT(*) AS ct FROM f
       |        WHERE source IN (${DSIR_TARGET.map(s => s"'$s'").mkString(", ")})
       |        GROUP BY 1),
       |tot AS (SELECT (SELECT SUM(cr) FROM raw) AS nr,
       |               (SELECT SUM(ct) FROM tgt) AS nt),
       |model AS (
       |  SELECT bucket,
       |    CAST(round(ln(
       |      ((COALESCE(ct, 0) + 1)::DOUBLE / (nt + $DSIR_B)) /
       |      ((cr + 1)::DOUBLE / (nr + $DSIR_B))), 8) AS DECIMAL(18,8))
       |      AS logratio
       |  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot)
       |SELECT doc_id, COUNT(*) AS n_feats,
       |  CAST(SUM(logratio) AS DOUBLE) / COUNT(*) AS dsir_score
       |FROM f JOIN model USING (bucket)
       |GROUP BY doc_id""".stripMargin

  // t14 — Gopher/C4-style composite filter VERDICT (Rae et al. 2021
  // §A1.1; Raffel et al. 2020 §2.2): the keep/drop decision a cleaning
  // pipeline actually executes, with a per-rule flag column so dropped
  // documents are attributable (the audit trail production filters
  // keep). Rules over signals this module already computes:
  //   r_len     — token count in [T14_MIN_TOK, T14_MAX_TOK]
  //   r_wordlen — mean word length in [3, 10] chars
  //   r_stop    — ≥ 2 English stopwords (Gopher's "stop word" rule;
  //               doubles as a cheap English-ID gate here)
  //   r_toptok  — most-frequent token ≤ 20% of tokens (t07's signal)
  //   r_dup3    — duplicate-trigram share ≤ 30% (t07's signal)
  // Every threshold compares cross-multiplied INTEGERS (5·top ≤ n, not
  // top/n ≤ 0.2), so the verdict is bit-identical across engines — no
  // float boundary to flip a keep into a drop.
  //
  // Scale shape: per-document expressions only — zero shuffle, one
  // WholeStageCodegen pass over the scan at any corpus size; at 100 TB
  // this runs as the map side of whatever consumes it (p01 composes the
  // same shape).
  private val T14_MIN_TOK = 20L
  private val T14_MAX_TOK = 80L

  private def t14(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val tk = split(col("text"), "\\s+")
    val nTok = size(tk).cast(LongType)
    val chars = charCountNoSpace(col("text")).cast(LongType)
    val nStop = tokensIn(col("text"), enStop).cast(LongType)
    val topCnt = topTokenCount(tk).cast(LongType)
    val triTotal = (size(tk) - lit(2)).cast(LongType)
    val triDistinct = size(array_distinct(transform(
      sequence(lit(1), size(tk) - lit(2)),
      i => array_join(slice(tk, i, lit(3)), " ")))).cast(LongType)
    def flag(c: org.apache.spark.sql.Column) = when(c, 1).otherwise(0)
    // < 3 tokens ⇒ no trigrams ⇒ vacuously clean. Outer `when`, not a
    // `||`: Spark's sequence(1, n-2) runs DESCENDING for n < 3 and its
    // slice(tk, 0, _) throws under ANSI — CaseWhen evaluates the guarded
    // branch only for rows that reach it, a boolean Or does not.
    val rDup3 = when(triTotal < 1L, 1)
      .otherwise(flag((triTotal - triDistinct) * 10L <= triTotal * 3L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        nTok.as("n_tok"),
        flag(nTok >= T14_MIN_TOK && nTok <= T14_MAX_TOK).as("r_len"),
        flag(chars >= nTok * 3L && chars <= nTok * 10L).as("r_wordlen"),
        flag(nStop >= 2L).as("r_stop"),
        flag(topCnt * 5L <= nTok).as("r_toptok"),
        rDup3.as("r_dup3"))
      .withColumn("keep",
        col("r_len") * col("r_wordlen") * col("r_stop") *
          col("r_toptok") * col("r_dup3"))
  }

  private val t14Sql = {
    val stop = enStop.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    string_split_regex(text, '\\s+') AS tk FROM documents),
       |sig AS (
       |  SELECT doc_id, source,
       |    len(tk) AS n_tok,
       |    length(regexp_replace(text, '\\s', '', 'g')) AS chars,
       |    len(list_filter(tk, x -> x IN ($stop))) AS n_stop,
       |    list_max(list_transform(list_distinct(tk),
       |      u -> len(list_filter(tk, x -> x = u)))) AS top_cnt,
       |    len(tk) - 2 AS tri_total,
       |    CASE WHEN len(tk) >= 3 THEN
       |      len(list_distinct(list_transform(
       |        generate_series(1, len(tk) - 2),
       |        i -> array_to_string(tk[i:i+2], ' '))))
       |    ELSE 0 END AS tri_distinct
       |  FROM t),
       |r AS (
       |  SELECT doc_id, source, n_tok,
       |    CASE WHEN n_tok >= $T14_MIN_TOK AND n_tok <= $T14_MAX_TOK
       |      THEN 1 ELSE 0 END AS r_len,
       |    CASE WHEN chars >= n_tok * 3 AND chars <= n_tok * 10
       |      THEN 1 ELSE 0 END AS r_wordlen,
       |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
       |    CASE WHEN top_cnt * 5 <= n_tok THEN 1 ELSE 0 END AS r_toptok,
       |    CASE WHEN tri_total < 1
       |           OR (tri_total - tri_distinct) * 10 <= tri_total * 3
       |      THEN 1 ELSE 0 END AS r_dup3
       |  FROM sig)
       |SELECT doc_id, source, n_tok, r_len, r_wordlen, r_stop, r_toptok,
       |  r_dup3,
       |  r_len * r_wordlen * r_stop * r_toptok * r_dup3 AS keep
       |FROM r""".stripMargin
  }

  // t16 — BPE pair counting: the inner loop of byte-pair-encoding
  // tokenizer training (Sennrich et al. 2016) at corpus scale — count
  // adjacent CHARACTER pairs within words (t06's bigrams count word
  // pairs; this is the symbol-level statistic a merge step consumes)
  // and rank the top candidates. One full BPE training run would loop:
  // merge rank-1, re-segment, recount — each iteration is exactly this
  // query over the evolving symbol stream.
  //
  // Scale shape: the pair space is bounded (alphabet², thousands of
  // distinct keys at any corpus size), so the count collapses almost
  // entirely map-side and the exchange carries ≤ tasks·|pairs| rows;
  // the top-k is TakeOrderedAndProject (no global sort), and the rank
  // window runs over the ≤ BPE_TOP survivors on one partition — rows
  // that number in the hundreds regardless of corpus size.
  private val BPE_TOP = 100

  private def t16(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
    val top = pairs.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(BPE_TOP)
    top.withColumn("rnk",
      row_number().over(Window.orderBy(col("cnt").desc, col("pair"))))
  }

  private val t16Sql =
    s"""WITH w AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS w
       |  FROM documents),
       |p AS (
       |  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
       |    i -> substr(w, i, 2))) AS pair
       |  FROM w WHERE length(w) >= 2),
       |c AS (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY 1)
       |SELECT pair, cnt, rnk FROM (
       |  SELECT pair, cnt,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS INT) AS rnk
       |  FROM c) t
       |WHERE rnk <= $BPE_TOP""".stripMargin

  // t17 — the BPE TRAINING loop t16's single statistic feeds (Sennrich
  // et al. 2016, algorithm 1): merge the top pair, re-segment, recount,
  // T17_MERGES times. The result is the learned merge table — the
  // artifact a tokenizer trainer actually ships.
  //
  // The key scale move: BPE trains on the WORD-FREQUENCY table, not the
  // corpus. One corpus-scale aggregation collapses 100 TB of text into
  // the bounded word-type vocabulary (the reference dictionary is 355 k
  // types; real web corpora are single-digit millions), and every merge
  // iteration is a narrow pass over that cached table weighted by
  // counts. Words are segmented as \x01-prefixed symbol strings, so a
  // merge is a plain left-to-right non-overlapping string replace —
  // identical greedy semantics in Spark and DuckDB, and the \x01 anchor
  // makes "a then b" unambiguous however many characters each merged
  // symbol spans. Merge selection is inherently sequential (iteration
  // k's counts depend on k−1's winner), so the driver collects exactly
  // ONE (pair, count) row per iteration — the same scalar-per-round
  // pattern as s06's Lloyd centroids — and the merge table itself (4
  // rows) is driver-assembled by construction.
  //
  // Determinism: counts are integer sums; ties break on (sym_a, sym_b)
  // binary order in both engines.
  private val T17_MERGES = 4
  private val BPE_SEP = "\u0001"

  private def t17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", BPE_SEP + "$1").as("seg"),
              col("cnt"))
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      var seg = vocab
      var it = 1
      var exhausted = false
      while (it <= T17_MERGES && !exhausted) {
        val top = seg
          .select(col("cnt"),
            expr(s"filter(split(seg, '$BPE_SEP'), s -> s != '')").as("sy"))
          .where(size(col("sy")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(0, size(sy) - 2)," +
              " i -> struct(sy[i] AS a, sy[i + 1] AS b))")).as("p"))
          .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        top.headOption match {
          case Some(r) =>
            val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
            merges += ((it, a, b, c))
            seg = seg.select(
              call_function("replace", col("seg"),
                lit(BPE_SEP + a + BPE_SEP + b),
                lit(BPE_SEP + a + b)).as("seg"),
              col("cnt"))
            it += 1
          case None => exhausted = true
        }
      }
    } finally vocab.unpersist()
    merges.result().toDF("it", "sym_a", "sym_b", "cnt")
      .select(col("it"), col("sym_a"), col("sym_b"),
        concat(col("sym_a"), col("sym_b")).as("merged"), col("cnt"))
  }

  /** the DuckDB twin unrolls the same loop: wN = segmentation after N
    * merges, pN+1 = its pair counts, tN+1 = the winner applied to make
    * wN+1. Each tN is the scalar the Spark driver collects. */
  private val t17Sql = {
    def pairCte(p: String, w: String) =
      s"""$p AS (
         |  SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
         |    SELECT cnt, string_split(pr, chr(2))[1] AS a,
         |           string_split(pr, chr(2))[2] AS b
         |    FROM (SELECT cnt,
         |        unnest(list_transform(generate_series(1, len(sy) - 1),
         |          i -> sy[i] || chr(2) || sy[i+1])) AS pr
         |      FROM (SELECT cnt,
         |          list_filter(string_split(seg, chr(1)), s -> s <> '') AS sy
         |        FROM $w)))
         |  GROUP BY 1, 2)""".stripMargin
    def topCte(t: String, p: String) =
      s"$t AS (SELECT a, b, cnt FROM $p ORDER BY cnt DESC, a, b LIMIT 1)"
    def mergeCte(wNext: String, w: String, t: String) =
      s"""$wNext AS (
         |  SELECT w.cnt, replace(w.seg, chr(1) || t.a || chr(1) || t.b,
         |                        chr(1) || t.a || t.b) AS seg
         |  FROM $w w CROSS JOIN $t t)""".stripMargin
    val rounds = (1 to T17_MERGES).map { i =>
      val tail = if (i < T17_MERGES) ",\n" + mergeCte(s"w$i", s"w${i - 1}", s"t$i") else ""
      pairCte(s"p$i", s"w${i - 1}") + ",\n" + topCte(s"t$i", s"p$i") + tail
    }.mkString(",\n")
    val out = (1 to T17_MERGES).map(i =>
      s"SELECT CAST($i AS INT) AS it, a AS sym_a, b AS sym_b, a || b AS merged, cnt FROM t$i")
      .mkString("\nUNION ALL\n")
    s"""WITH wc AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split_regex(text, '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |w0 AS (
       |  SELECT cnt, regexp_replace(w, '(.)', chr(1) || '\\1', 'g') AS seg
       |  FROM wc),
       |$rounds
       |$out""".stripMargin
  }

  // t18 — PMI collocation extraction (Church & Hanks 1990): rank word
  // pairs by pointwise mutual information p(a,b)/(p(a)p(b)) — the
  // classic "strongly associated phrase" statistic a corpus analyst
  // runs next to raw bigram counts (t06), which rank by frequency and
  // so surface stopword pairs first. PMI normalizes by the parts'
  // own frequencies, so "los angeles" outranks "of the".
  //
  // Determinism across engines: the score is the SCALED-INTEGER ratio
  //   pmi_ppm = (1e6 · c_ab · N_uni²) div (c_a · c_b · N_bi)
  // (p(a,b) = c_ab/N_bi over bigram occurrences, p(w) = c_w/N_uni over
  // token occurrences — the ratio in parts-per-million, floor'd).
  // Products route through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB):
  // both are exact integer arithmetic and both `div`s floor on the
  // all-positive operands, so the engines emit bit-identical scores.
  // Headroom: 38 digits hold the numerator up to N_uni ≈ 3×10^12
  // tokens (≈ 15 TB of text) at c_ab = 10^6; past that, decimate the
  // counts by a common power of two before scoring (the ratio is
  // scale-invariant) — a constant-fold, not a plan change.
  //
  // 100 TB shape: two corpus-scale counts (unigram, bigram) — each ONE
  // exchange onto a bounded key space (word types / observed pairs,
  // millions of keys independent of corpus size); the totals are
  // 1-row aggregates OVER THOSE COUNT TABLES (no third corpus scan)
  // and broadcast; the scoring joins touch only the bounded pair
  // space; the tail is TakeOrderedAndProject. Count tables cache for
  // their two/three uses and unpersist behind a lineage-truncated
  // ≤T18_TOP-row result (the g01 loop discipline).
  private val T18_MIN = 5L
  private val T18_TOP = 100
  private val T18_SCALE = 1000000L

  /** Shared corpus substrate — whitespace tokens → adjacent word pairs
    * (a, b) — used identically by t18's bigram counts and the graph
    * family's edge construction (g01/g02); one definition so the
    * "shared bigram statistic" claim cannot drift between the ops. */
  private[operators] def wordPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(expr("filter(split(text, '\\\\s+'), s -> s != '')").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> struct(tk[i] AS a, tk[i + 1] AS b))")).as("p"))
      .select(col("p.a"), col("p.b"))

  /** the full scoring plan BEFORE lineage truncation, plus the cached
    * count tables it reuses — the gated t18 materializes the plan
    * through localCheckpoint and unpersists the caches; PlanSpec pins
    * the uncached shape directly (truncation would otherwise hide it
    * behind a Scan ExistingRDD) */
  private[graft] def t18Plan(spark: SparkSession, dir: String,
                             cache: Boolean = false): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    def hold(df: DataFrame) = if (cache) df.cache() else df
    val tk = Tables.documents(spark, dir)
      .select(expr("filter(split(text, '\\\\s+'), s -> s != '')").as("tk"))
    val uc = hold(tk.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1")))
    val bc = hold(wordPairs(spark, dir)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt")))
    // totals aggregate the bounded count tables, not the corpus
    val totals = uc.agg(sum(col("c1")).as("nuni"))
      .crossJoin(bc.agg(sum(col("cnt")).as("nbi")))
    val out = bc.where(col("cnt") >= T18_MIN)
      .join(uc.select(col("w").as("a"), col("c1").as("ca")), Seq("a"))
      .join(uc.select(col("w").as("b"), col("c1").as("cb")), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_ppm", expr(
        s"CAST((CAST($T18_SCALE AS DECIMAL(38,0)) * cnt * nuni * nuni)" +
          " div (CAST(ca AS DECIMAL(38,0)) * cb * nbi) AS BIGINT)"))
      .orderBy(col("pmi_ppm").desc, col("a"), col("b")).limit(T18_TOP)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pmi_ppm").desc, col("a"), col("b"))))
      .select(col("rnk"), col("a"), col("b"), col("cnt"), col("pmi_ppm"))
    (out, Seq(uc, bc))
  }

  private def t18(spark: SparkSession, dir: String): DataFrame = {
    val (plan, caches) = t18Plan(spark, dir, cache = true)
    val out = plan.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  private val t18Sql =
    s"""WITH tk AS (
       |  SELECT list_filter(string_split_regex(text, '\\s+'), s -> s <> '')
       |    AS tk FROM documents),
       |uc AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
       |  FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY 1),
       |bc AS (
       |  SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
       |      i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
       |    FROM tk WHERE len(tk) >= 2)
       |  GROUP BY 1, 2),
       |tot AS (
       |  SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM uc) AS nuni,
       |         (SELECT CAST(SUM(cnt) AS BIGINT) FROM bc) AS nbi),
       |s AS (
       |  SELECT bc.a, bc.b, bc.cnt,
       |    CAST((CAST($T18_SCALE AS HUGEINT) * bc.cnt * t.nuni * t.nuni)
       |      // (CAST(ua.c1 AS HUGEINT) * ub.c1 * t.nbi) AS BIGINT)
       |      AS pmi_ppm
       |  FROM bc JOIN uc ua ON bc.a = ua.w JOIN uc ub ON bc.b = ub.w
       |  CROSS JOIN tot t
       |  WHERE bc.cnt >= $T18_MIN)
       |SELECT rnk, a, b, cnt, pmi_ppm FROM (
       |  SELECT a, b, cnt, pmi_ppm,
       |    CAST(ROW_NUMBER() OVER (ORDER BY pmi_ppm DESC, a, b) AS INT)
       |      AS rnk
       |  FROM s) t
       |WHERE rnk <= $T18_TOP""".stripMargin

  // t19 — vocabulary DRIFT detection (the data-quality monitor a
  // pipeline runs between crawls / between train and validation
  // splits): two-sample χ² per word across the corpus's doc_id halves,
  // ranked by divergence — the statistic that answers "did the token
  // distribution move, and which words moved it". The split is the
  // MAX-derived doc_id cut (d11's `half` convention), deterministic at
  // every SF.
  //
  // Determinism: χ² for the word's 2×2 table (a=o1, b=o2, c=N1−o1,
  // d=N2−o2) is N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) — computed as the
  // SCALED-INTEGER ratio chi2_micro with all products routed through
  // DECIMAL(38,0)/HUGEINT (the t18 discipline), so both engines emit
  // bit-identical scores. Headroom (sharper than t18's — the numerator
  // is quintic): |o1·n2 − o2·n1| ≤ o·n, so the numerator ≈ 2e6·o²·n³
  // must stay under 10^38 ⇒ with the most frequent word at ~1% share
  // that bounds the halves at ~10^7 tokens each. Past that, DECIMATE
  // the counts by a common power of two before scoring — χ² scales
  // linearly with the common count scale, so the RANKING (which is
  // what the op emits) is preserved up to floor rounding; the
  // decimation is a constant-fold, not a plan change.
  //
  // 100 TB shape: one corpus scan → one exchange onto the bounded word
  // space with the half-split folded into conditional partial sums
  // (map-side combine); totals are a 1-row aggregate over the count
  // table, broadcast; the tail is TakeOrderedAndProject.
  private val T19_MIN = 5L
  private val T19_TOP = 50
  private val T19_SCALE = 1000000L

  private def t19(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val cutDf = docs.agg(expr("(MAX(doc_id) + 1) div 2").as("cut"))
    val words = docs.crossJoin(broadcast(cutDf))
      .select(expr("filter(split(text, '\\\\s+'), s -> s != '')").as("tk"),
              (col("doc_id") < col("cut")).as("first_half"))
      .select(explode(col("tk")).as("w"), col("first_half"))
    val counts = words.groupBy(col("w"))
      .agg(sum(when(col("first_half"), 1L).otherwise(0L)).as("o1"),
           sum(when(col("first_half"), 0L).otherwise(1L)).as("o2"))
    val totals = counts.agg(sum(col("o1")).as("n1"), sum(col("o2")).as("n2"))
    counts.where(col("o1") + col("o2") >= T19_MIN)
      .crossJoin(broadcast(totals))
      .withColumn("chi2_micro", expr(
        // the inner difference is promoted BEFORE its products form —
        // left in BIGINT, o1·(n2−o2) wraps past ~3e9 tokens per half
        // (silently under Spark's non-ANSI arithmetic, an error in
        // DuckDB: divergent failure modes and a silently wrong Spark
        // ranking — round-8 advisor); promoted, the only bound left is
        // the documented DECIMAL(38,0) numerator headroom (~1e7 tokens
        // per half at a 1% top-word share)
        s"""CAST(((n1 + n2) * CAST($T19_SCALE AS DECIMAL(38,0))
           | * (CAST(o1 AS DECIMAL(38,0)) * (n2 - o2)
           |    - CAST(o2 AS DECIMAL(38,0)) * (n1 - o1))
           | * (CAST(o1 AS DECIMAL(38,0)) * (n2 - o2)
           |    - CAST(o2 AS DECIMAL(38,0)) * (n1 - o1)))
           | div (CAST(o1 + o2 AS DECIMAL(38,0))
           |   * (n1 - o1 + n2 - o2) * n1 * n2) AS BIGINT)"""
          .stripMargin.replaceAll("\n", " ")))
      .orderBy(col("chi2_micro").desc, col("w")).limit(T19_TOP)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("chi2_micro").desc, col("w"))))
      .select(col("rnk"), col("w"), col("o1"), col("o2"), col("chi2_micro"))
  }

  private val t19Sql =
    s"""WITH cut AS (
       |  SELECT (MAX(doc_id) + 1) // 2 AS cut FROM documents),
       |words AS (
       |  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
       |    s -> s <> '')) AS w, doc_id < cut.cut AS first_half
       |  FROM documents CROSS JOIN cut),
       |counts AS (
       |  SELECT w,
       |    CAST(SUM(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS o1,
       |    CAST(SUM(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT) AS o2
       |  FROM words GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(o1) AS BIGINT) AS n1, CAST(SUM(o2) AS BIGINT) AS n2
       |  FROM counts),
       |s AS (
       |  SELECT w, o1, o2,
       |    CAST(((n1 + n2) * CAST($T19_SCALE AS HUGEINT)
       |      * (CAST(o1 AS HUGEINT) * (n2 - o2)
       |         - CAST(o2 AS HUGEINT) * (n1 - o1))
       |      * (CAST(o1 AS HUGEINT) * (n2 - o2)
       |         - CAST(o2 AS HUGEINT) * (n1 - o1)))
       |      // (CAST(o1 + o2 AS HUGEINT)
       |        * (n1 - o1 + n2 - o2) * n1 * n2) AS BIGINT) AS chi2_micro
       |  FROM counts CROSS JOIN tot
       |  WHERE o1 + o2 >= $T19_MIN)
       |SELECT rnk, w, o1, o2, chi2_micro FROM (
       |  SELECT w, o1, o2, chi2_micro,
       |    CAST(ROW_NUMBER() OVER (ORDER BY chi2_micro DESC, w) AS INT)
       |      AS rnk
       |  FROM s) t
       |WHERE rnk <= $T19_TOP""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("t01_token_stats", t01, Some(t01Sql)),
    QuerySpec("t02_quality_score", t02, Some(t02Sql)),
    QuerySpec("t03_lang_id", t03, Some(t03Sql)),
    QuerySpec("t04_fingerprint", t04, Some(t04Sql)),
    QuerySpec("t05_tfidf", t05, Some(t05Sql)),
    QuerySpec("t06_bigrams", t06, Some(t06Sql)),
    QuerySpec("t07_repetition", t07, Some(t07Sql)),
    QuerySpec("t08_lm_score", t08, Some(t08Sql)),
    QuerySpec("t09_lm_score_pretrained", t09, Some(t08Sql)),
    QuerySpec("t10_stratified_sample", t10, Some(t10Sql)),
    QuerySpec("t11_pii_redaction", t11, Some(t11Sql)),
    QuerySpec("t12_sequence_packing", t12, Some(t12Sql)),
    QuerySpec("t13_dsir_importance", t13, Some(t13Sql)),
    QuerySpec("t14_filter_verdict", t14, Some(t14Sql)),
    QuerySpec("t15_dsir_pretrained", t15, Some(t13Sql)),
    QuerySpec("t16_bpe_pair_counts", t16, Some(t16Sql)),
    QuerySpec("t17_bpe_merge_loop", t17, Some(t17Sql)),
    QuerySpec("t18_pmi_collocations", t18, Some(t18Sql)),
    QuerySpec("t19_vocab_drift", t19, Some(t19Sql)))
}
