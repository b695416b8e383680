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
  * 100 TB shape — ONE full corpus scan end to end (a first cut with
  * groupBy-min + semi-join dedup and an anti-join decontamination
  * planned FIVE parquet scans of the corpus; every stateless re-use of
  * a stage subtree re-derived it from the scan):
  *  - stage 1 is a codegen filter on the scan;
  *  - stage 2 is row_number()=1 over (fingerprint, doc_id) — the same
  *    keep-min semantics as a self-join, in one fingerprint shuffle of
  *    survivors with no second scan;
  *  - stage 3 explodes survivors' 8-grams WITH their output columns
  *    carried along, left-joins the broadcast eval-gram set, and
  *    collapses back to one row per doc via max(hit). Grams of a doc
  *    stay in their partition, so the partial aggregation collapses
  *    them map-side and the exchange carries ~1 row per doc.
  *  - the only other scan reads eval docs under a doc_id < 10 pushed
  *    filter — row-group-pruned to nearly nothing.
  */
object Pipeline {

  private val QUALITY_PCT = 60 // θ = 0.60 of t02's composite quality
  private val DECON_N = 8
  private val BENCH_DOCS = 10L

  private def p01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
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

    // stage 2 — exact dedup, keep-min per normalized fingerprint:
    // row_number over (fp, doc_id) ≡ the groupBy-min + semi-join
    // formulation, minus the second corpus scan it planned. Eval docs
    // leave the corpus here too (they are never trainable).
    val w = Window.partitionBy(normFingerprint(col("text")))
      .orderBy(col("doc_id"))
    val surv = q.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("doc_id") >= BENCH_DOCS)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

    // stage 3 — decontamination: eval 8-grams from the FULL corpus
    // (an eval doc that failed quality still contaminates), read under
    // a pushed doc_id < 10 filter; survivors' grams carry the output
    // columns so the contamination verdict is a per-doc max, not a
    // join back to a re-derived survivor subtree
    val bench = docs.where(col("doc_id") < BENCH_DOCS)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (_, text) =>
        val toks = Dedup.ShingleUtil.tokens(text)
        if (toks.length < DECON_N) Iterator.empty
        else Dedup.ShingleUtil.shingles(toks, DECON_N).iterator
      }.toDF("sh").distinct()
    val gramRows = surv.as[(Long, String, String, String)]
      .flatMap { case (id, lang, source, text) =>
        val toks = Dedup.ShingleUtil.tokens(text)
        // a doc too short to shingle must still emit its row: a null
        // sentinel gram joins nothing and scores hit = 0
        if (toks.length < DECON_N) Iterator((id, lang, source, None))
        else Dedup.ShingleUtil.shingles(toks, DECON_N).iterator
          .map(sh => (id, lang, source, Option(sh)))
      }.toDF("doc_id", "lang", "source", "sh")
    gramRows
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(max(coalesce(col("hit"), lit(0))).as("contaminated"))
      .where(col("contaminated") === 0)
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

  // ---------------------------------------------------------------------
  // p02 — the EMBEDDING-side curation pipeline (p01 is the text side):
  //       cluster → SemDeDup prune → quantize survivors, i.e. exactly
  //       what a production vector store runs before indexing a corpus.
  //       Composition closure again — each stage consumes the previous
  //       stage's survivors and the oracle checks the composed result:
  //         1. k-means assignment (s06's deterministic Lloyd — shared
  //            CTE body, both engines score the identical clustering);
  //         2. SemDeDup within clusters at the d05/d10 threshold —
  //            is_dup = 0 survivors only (d10's flag frame verbatim);
  //         3. int8 range quantization + reconstruction error (s05's
  //            kernel) over survivors only — the compressed index is
  //            built AFTER dedup, so no storage is spent on rows that
  //            were about to be dropped.
  //       100 TB shape: stages 1-2 are the s06/d10 shapes (broadcast
  //       centroids, one cluster-hash exchange, within-cluster pair
  //       space); stage 3 is a narrow per-row pass over survivors with
  //       no shuffle at all — the pipeline adds NOTHING to the widest
  //       exchange of its parts. Unlike d10 (the exhaustive
  //       within-cluster baseline), the dedup stage here runs CAPPED:
  //       cluster members sub-bucket in groups of P02_SUB_CAP by vec_id
  //       rank, and only same-sub-bucket pairs compare — so a skewed
  //       mega-cluster on a real dense corpus costs O(n·cap) pairs, not
  //       n² (round-7 verdict watch item). The recall trade (boundary-
  //       straddling near-dups survive) is the embedding-side analog of
  //       d02's df cap, and the oracle mirrors the cap exactly.
  // ---------------------------------------------------------------------
  private val P02_SUB_CAP = 32

  private def p02(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val surv = Dedup.semdedupFlags(spark, dir, Some(P02_SUB_CAP))
      .where(col("is_dup") === 0)
      .select(col("vec_id"), col("cluster"))
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("emb"))
    Similarity.quantized(emb.join(surv, Seq("vec_id")))
      .select(col("vec_id"), col("cluster"), col("qmin"), col("qmax"),
              col("mean_abs_err"))
  }

  private val p02Sql =
    s"""WITH ${Similarity.kmeansCteBody},
       |${Dedup.semdedupCtesFor(Some(P02_SUB_CAP))},
       |surv AS (
       |  SELECT a2.vec_id, a2.cluster
       |  FROM a2 LEFT JOIN dups d USING (vec_id)
       |  WHERE d.vec_id IS NULL),
       |e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings JOIN surv USING (vec_id)),
       |s AS (
       |  SELECT vec_id, emb, list_min(emb) AS qmin, list_max(emb) AS qmax,
       |    (list_max(emb) - list_min(emb)) / 255.0 AS scale
       |  FROM e)
       |SELECT s.vec_id, surv.cluster, qmin, qmax,
       |  CASE WHEN scale = 0 THEN 0.0 ELSE
       |    round(list_sum(list_transform(emb, x ->
       |      abs(x - (qmin + least(greatest(floor((x - qmin) / scale + 0.5),
       |                                     0.0), 255.0) * scale))))
       |          / len(emb), 6)
       |  END AS mean_abs_err
       |FROM s JOIN surv USING (vec_id)""".stripMargin

  // ---------------------------------------------------------------------
  // p03 — domain-mixing epoch assembly (the Pile / DoReMi-style step
  //       t10's downsampler can't express): each source gets a target
  //       weight in EPOCHS, and the assembled training corpus contains
  //       floor(w) full copies of every document plus one more with
  //       probability frac(w) — so a 2.5-epoch curated source
  //       contributes each doc 2 or 3 times while a 0.25-epoch crawl
  //       source keeps 1 in 4 docs. The fractional coin is a pure
  //       function of (source, doc_id) through the cross-engine md5
  //       idiom (t13's bucket hash), in integer milli-epoch units —
  //       deterministic, reproducible, no float threshold.
  //
  //       Weights mirror t13's DSIR framing: src0-3 are the curated
  //       target (2.5 epochs), src4-9 mid-quality (1 epoch), the rest
  //       crawl-grade (0.25 epochs).
  //
  //       100 TB shape: zero shuffle — one codegen pass over the scan
  //       (hash, compare, explode a ≤3-element sequence); the weight
  //       table is a literal here and a broadcast join in production.
  //       Output size is Σ wᵢ·nᵢ rows by construction, so the op plans
  //       the epoch mix without ever materializing an intermediate
  //       corpus copy.
  // ---------------------------------------------------------------------
  private val MIX_CURATED = Seq("src0", "src1", "src2", "src3")
  private val MIX_MID = Seq("src4", "src5", "src6", "src7", "src8", "src9")
  private val MIX_W_CURATED = 2500L // milli-epochs
  private val MIX_W_MID = 1000L
  private val MIX_W_TAIL = 250L

  /** epoch-repetition expansion over any (doc_id, source) frame —
    * shared by the standalone p03 and the composed p04. The coin is a
    * pure function of (source, doc_id) through the cross-engine md5
    * idiom (t13's bucket hash), salted with the source so the same
    * doc_id draws independent coins across sources. */
  private def mixEpochs(docs: DataFrame): DataFrame = {
    val w = when(col("source").isin(MIX_CURATED: _*), MIX_W_CURATED)
      .when(col("source").isin(MIX_MID: _*), MIX_W_MID)
      .otherwise(MIX_W_TAIL)
    val coin = pmod(
      conv(substring(md5(concat_ws(":", col("source"), col("doc_id"))),
        1, 15), 16, 10).cast(LongType), lit(1000L))
    docs.select(col("doc_id"), col("source"),
        w.as("w_milli"), coin.as("coin"))
      .withColumn("n_copies",
        expr("w_milli div 1000") +
          when(col("coin") < col("w_milli") % 1000L, 1L).otherwise(0L))
      .where(col("n_copies") >= 1L)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("epoch"))
  }

  private def p03(spark: SparkSession, dir: String): DataFrame =
    mixEpochs(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")))

  private val p03Sql = {
    val curated = MIX_CURATED.map(s => s"'$s'").mkString(", ")
    val mid = MIX_MID.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    CASE WHEN source IN ($curated) THEN $MIX_W_CURATED
       |         WHEN source IN ($mid) THEN $MIX_W_MID
       |         ELSE $MIX_W_TAIL END AS w_milli,
       |    CAST(concat('0x', substring(md5(
       |      source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      % 1000 AS coin
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    w_milli // 1000 +
       |      CASE WHEN coin < w_milli % 1000 THEN 1 ELSE 0 END AS n_copies
       |  FROM w)
       |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
       |  CAST(epoch AS BIGINT) AS epoch
       |FROM c, LATERAL (SELECT unnest(generate_series(1, n_copies)) AS epoch)
       |WHERE n_copies >= 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // p04 — corpus → TRAINING SEQUENCES, end to end: the full text-side
  //       assembly a pretraining run consumes, composed from the gated
  //       stages — p01's cleaned survivors (quality gate → exact dedup
  //       → decontamination) are epoch-mixed by source weight (p03's
  //       kernel) and the mixed stream is packed into fixed 512-token
  //       sequences (t12's distributed prefix sum, here over the
  //       (doc_id, epoch) order — a doc sampled for 3 epochs occupies
  //       3 disjoint spans of the token stream). One query from raw
  //       corpus to "which chunk does each training copy land in".
  //
  //       100 TB shape: union of its parts' — p01's single corpus scan
  //       + one pushed-projection n_tok scan, the zero-shuffle mixing
  //       explode, and the two-phase prefix sum whose only
  //       single-partition work is ≤ P04_SHARDS shard totals. The
  //       composition adds NO exchange beyond its widest part.
  // ---------------------------------------------------------------------
  private val P04_SEQ = 512L
  private val P04_SHARDS = 32L

  private def p04(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val surv = p01(spark, dir).select(col("doc_id"), col("source"))
    val ntok = Tables.documents(spark, dir).select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"))
    val mixed = mixEpochs(surv).join(ntok, Seq("doc_id"))
    // t12's order-preserving range shards, over (doc_id, epoch): a
    // doc's epochs share its shard, so shard is monotone in the global
    // (doc_id, epoch) order and per-shard windows compose exactly
    val bounds = mixed.agg(max(col("doc_id")).as("max_id"))
    val sharded = mixed.crossJoin(broadcast(bounds))
      .withColumn("shard",
        coalesce(expr(s"(doc_id * $P04_SHARDS) div (max_id + 1)"),
          lit(-1L)))
      .drop("max_id")
    val localW = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("local_before",
      coalesce(sum(col("n_tok")).over(localW), lit(0L)))
    val baseW = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy(col("shard"))
      .agg(max(col("local_before") + col("n_tok")).as("shard_total"))
      .withColumn("shard_base",
        coalesce(sum(col("shard_total")).over(baseW), lit(0L)))
      .select(col("shard"), col("shard_base"))
    local.join(broadcast(bases), Seq("shard"))
      .withColumn("tok_start", col("shard_base") + col("local_before"))
      .select(col("doc_id"), col("epoch"), col("source"), col("n_tok"),
        col("tok_start"),
        expr(s"tok_start div $P04_SEQ").as("first_chunk"),
        expr(s"(tok_start + n_tok - 1) div $P04_SEQ").as("last_chunk"))
  }

  private val p04Sql = {
    val curated = MIX_CURATED.map(s => s"'$s'").mkString(", ")
    val mid = MIX_MID.map(s => s"'$s'").mkString(", ")
    s"""WITH srv AS ($p01Sql),
       |n AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tok
       |  FROM documents),
       |wgt AS (
       |  SELECT doc_id, source,
       |    CASE WHEN source IN ($curated) THEN $MIX_W_CURATED
       |         WHEN source IN ($mid) THEN $MIX_W_MID
       |         ELSE $MIX_W_TAIL END AS w_milli,
       |    CAST(concat('0x', substring(md5(
       |      source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      % 1000 AS coin
       |  FROM srv),
       |cps AS (
       |  SELECT doc_id, source,
       |    w_milli // 1000 +
       |      CASE WHEN coin < w_milli % 1000 THEN 1 ELSE 0 END AS n_copies
       |  FROM wgt),
       |mixed AS (
       |  SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
       |  FROM cps, LATERAL (SELECT unnest(generate_series(1, n_copies))
       |    AS epoch)
       |  WHERE n_copies >= 1),
       |rs AS (
       |  SELECT m.doc_id, m.epoch, m.source, n.n_tok
       |  FROM mixed m JOIN n USING (doc_id)),
       |c AS (
       |  -- CAST: windowed SUM(BIGINT) is HUGEINT in DuckDB (pandas
       |  -- float64), which breaks the driver's value hash
       |  SELECT doc_id, epoch, source, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id, epoch
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tok_start
       |  FROM rs)
       |SELECT doc_id, epoch, source, n_tok, tok_start,
       |  CAST(tok_start // $P04_SEQ AS BIGINT) AS first_chunk,
       |  CAST((tok_start + n_tok - 1) // $P04_SEQ AS BIGINT) AS last_chunk
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------------
  // p05 — curriculum ordering: assign every document a deterministic
  //       global training position that is easy→hard ACROSS phases and
  //       uniformly shuffled WITHIN each phase (the standard curriculum-
  //       learning data order: difficulty staging without intra-phase
  //       ordering bias). Difficulty proxy = n_chars against FIXED
  //       thresholds — deliberately not quantiles, so phase assignment
  //       is a zero-shuffle codegen'd CASE, stable as the corpus grows,
  //       and reproducible in any engine; the within-phase shuffle key
  //       is the md5-derived integer p03 already uses for its sampling
  //       coin (seeded, engine-portable).
  //
  //       100 TB shape: one corpus scan; the rank window is PARTITIONED
  //       by phase... but a phase is corpus-scale, so the honest scale
  //       path for the within-phase rank is the t12/p04 two-phase
  //       prefix-sum over (phase, shard) — here the phase count is 4
  //       and the fixture fits a per-phase window; the phase-offset
  //       join shows the composition point where the sharded rank would
  //       slot in. Phase offsets are a 4-row broadcast.
  // ---------------------------------------------------------------------
  private val P05_EASY = 200L // n_chars phase thresholds (fixed, not
  private val P05_MID = 300L  // quantiles — see scaladoc)
  private val P05_HARD = 400L

  private def p05(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val phased = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("phase",
        when(col("n_chars") < P05_EASY, 1L)
          .when(col("n_chars") < P05_MID, 2L)
          .when(col("n_chars") < P05_HARD, 3L)
          .otherwise(4L))
      .withColumn("skey",
        conv(substring(md5(concat_ws(":", lit("p05"), col("doc_id"))),
          1, 15), 16, 10).cast(LongType))
    val w = Window.partitionBy(col("phase"))
      .orderBy(col("skey"), col("doc_id"))
    val pos = phased.withColumn("ppos", row_number().over(w).cast(LongType))
    // phase offsets: a ≤4-row aggregate + prefix sum, broadcast back
    val baseW = Window.orderBy(col("phase"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = phased.groupBy(col("phase"))
      .agg(count(lit(1)).as("n"))
      .withColumn("phase_base", coalesce(sum(col("n")).over(baseW), lit(0L)))
      .select(col("phase"), col("phase_base"))
    pos.join(broadcast(bases), Seq("phase"))
      .select(col("doc_id"), col("phase"), col("n_chars"),
              (col("phase_base") + col("ppos") - 1L).as("train_pos"))
  }

  private val p05Sql =
    s"""WITH ph AS (
       |  SELECT doc_id, n_chars,
       |    CASE WHEN n_chars < $P05_EASY THEN 1
       |         WHEN n_chars < $P05_MID THEN 2
       |         WHEN n_chars < $P05_HARD THEN 3 ELSE 4 END AS phase,
       |    CAST(concat('0x', substring(md5(
       |      'p05:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, n_chars, phase,
       |    ROW_NUMBER() OVER (PARTITION BY phase
       |      ORDER BY skey, doc_id) AS ppos
       |  FROM ph),
       |b AS (SELECT phase, COUNT(*) AS n FROM ph GROUP BY phase),
       |bb AS (
       |  -- CAST: windowed SUM(BIGINT) is HUGEINT in DuckDB
       |  SELECT phase, CAST(COALESCE(SUM(n) OVER (ORDER BY phase
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS phase_base
       |  FROM b)
       |SELECT p.doc_id, CAST(p.phase AS BIGINT) AS phase, p.n_chars,
       |  CAST(phase_base + ppos - 1 AS BIGINT) AS train_pos
       |FROM pos p JOIN bb USING (phase)""".stripMargin

  // p06 — the corpus report card: the per-source health dashboard a
  // data team reads before and after every pipeline change (the
  // datasheet/datacard statistic block) — doc volume, token volume,
  // language mix, exact-dup pressure, size profile — in ONE pass.
  // What each column answers: n_docs/n_tokens (how much data), n_langs
  // + top_lang share via n_top_lang (is the source what its label
  // claims), n_dup_docs (how much d01 would remove — exact text dups
  // counted against the per-source distinct), chars_min/max/total
  // (degenerate-document pressure at either tail).
  //
  // 100 TB shape: one corpus scan → one exchange on `source` (a
  // handful of groups); the dup and language statistics ride the SAME
  // aggregation as map-side partial count-distincts — no second scan,
  // no join. All counts integer-exact.
  private def p06(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        expr("size(filter(split(text, '\\\\s+'), s -> s != ''))")
          .cast("long").as("n_tok"),
        md5(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("n_tokens"),
           countDistinct(col("lang")).as("n_langs"),
           (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
           min(col("n_chars")).as("chars_min"),
           max(col("n_chars")).as("chars_max"),
           sum(col("n_chars")).as("chars_total"))

  private val p06Sql =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
      |    s -> s <> ''))) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
      |  MIN(n_chars) AS chars_min,
      |  MAX(n_chars) AS chars_max,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_total
      |FROM documents
      |GROUP BY source""".stripMargin

  // p07 — the CURATED LAKEHOUSE: the corpus run as a GOVERNED TABLE,
  // end to end through one GraftTable handle. Micro-batches of raw
  // documents stream-ingest with exactly-once batch-id commits (w19's
  // protocol), curation executes as a row-level DELETE of the
  // quality-rule failures (simple deterministic gates — length bounds
  // + a token floor — the t14/p01 family, expressed as a predicate
  // the table's planner sees), OPTIMIZE folds the per-batch small
  // files, retention vacuums the superseded versions, and the
  // survivors' per-source report reads off the head snapshot. The
  // oracle is the same rules applied relationally to the raw corpus —
  // however the stream was sliced and however the files were
  // rewritten, the governed table must hold exactly the keepers.
  //
  // This is the bridge between the two halves of the repo: the
  // text-pipeline ops (what to keep) and the table format (how the
  // kept corpus lives) — ingestion, mutation, compaction, and
  // retention all versioned, time-travelable, and exactly-once, the
  // way a production training-data corpus is actually operated.
  //
  // 100 TB shape: ingest cost is per-batch; the curation delete scans
  // each file once and rewrites only files holding failures; compact
  // bins small files only; the report is one aggregation over the
  // survivors. Nothing in the loop is table-squared.
  private val P07_MIN_CHARS = 150
  private val P07_MAX_CHARS = 500
  private val P07_MIN_TOK = 25

  private def p07(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.util.Scratch.dir("graft-p07-lakehouse")
    val t = graft.table.GraftTable.open(spark, root, "doc_id")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
              col("n_chars"))
    val stream = StreamingOps.stagedStream(spark, docs, files = 3)
    val query = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        t.streamAppend(b, batchId)
        ()
      }
      .option("checkpointLocation",
        graft.util.Scratch.shmDir("graft-p07-ckpt"))
      .start()
    try query.processAllAvailable() finally query.stop()
    val nTok = expr("size(filter(split(text, '\\\\s+'), s -> s != ''))")
    t.delete(col("n_chars") < P07_MIN_CHARS ||
             col("n_chars") > P07_MAX_CHARS || nTok < P07_MIN_TOK)
    t.compact()
    t.expire(keepLast = 1)
    t.read()
      .select(col("source"), col("n_chars"),
        expr("size(filter(split(text, '\\\\s+'), s -> s != ''))")
          .cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("n_tokens"),
           sum(col("n_chars")).as("chars_total"))
  }

  private val p07Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars,
       |    len(list_filter(string_split_regex(text, '\\s+'),
       |      s -> s <> '')) AS n_tok
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_total
       |FROM d
       |WHERE n_chars >= $P07_MIN_CHARS AND n_chars <= $P07_MAX_CHARS
       |  AND n_tok >= $P07_MIN_TOK
       |GROUP BY 1""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("p01_clean_corpus", p01, Some(p01Sql)),
    QuerySpec("p02_embedding_curation", p02, Some(p02Sql)),
    QuerySpec("p03_domain_mixing", p03, Some(p03Sql)),
    QuerySpec("p04_training_mix", p04, Some(p04Sql)),
    QuerySpec("p05_curriculum_order", p05, Some(p05Sql)),
    QuerySpec("p06_corpus_report", p06, Some(p06Sql)),
    QuerySpec("p07_curated_lakehouse", p07, Some(p07Sql)))
}
