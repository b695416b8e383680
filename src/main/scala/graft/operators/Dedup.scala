package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions.normFingerprint
import graft.functions.VectorFunctions.cosine

/** Deduplication operators over the `documents` / `embeddings` tables:
  * exact (hash-groupBy), n-gram Jaccard (exhaustive), MinHash+LSH
  * (the 100 TB-scale near-dup path), SimHash with pigeonhole banding,
  * and embedding-cosine near-dup.
  *
  * Scale posture:
  *  - d01 is one hash-shuffle on a 32-byte fingerprint — never on raw text.
  *  - d02 (exhaustive shingle join) is the *oracle* method: O(pairs sharing
  *    a shingle). Correct at any scale but join-heavy; it exists to define
  *    ground truth for the approximate paths.
  *  - d03 MinHash-LSH shuffles only (band, bucket) keys — candidate
  *    generation is linear in docs; exact Jaccard verification runs on
  *    candidates only. Band/row choice (16×4) puts collision probability
  *    at >0.9999 for J≥0.9 pairs (none exist between 0.07 and 0.9 in this
  *    corpus, and generally the J^r curve is steep), so output equals the
  *    exhaustive ground truth.
  *  - d04 SimHash: 4 chunks of 8 bits; hamming ≤ 3 guarantees an identical
  *    chunk (pigeonhole), so chunk-bucket candidates + exact hamming verify
  *    is EXACT, not approximate, while shuffling only (chunk_idx, chunk).
  *  - d05 cosine pairs: exhaustive baseline here; the LSH-bucketed variant
  *    lives in Similarity (s-ops).
  */
object Dedup {

  private val SHINGLE = 3
  private val JACC_T = 0.8
  private val P31 = 2147483647L // 2^31 - 1, prime

  /** Shingle/MinHash kernels shared by d02/d03, evaluated in typed
    * mapPartitions (tight loops; the interpreted HOF formulation was the
    * bench hotspot). Token split replicates Spark's split(text, "\\s+")
    * with limit -1 — and therefore DuckDB's string_split_regex — so the
    * Scala path produces byte-identical shingles to the SQL oracle. */
  private[operators] object ShingleUtil extends Serializable {
    private val ws = java.util.regex.Pattern.compile("\\s+")
    def tokens(text: String): Array[String] = ws.split(text, -1)

    /** distinct n-gram shingles, first-occurrence order (≡ array_distinct) */
    def shingles(toks: Array[String], n: Int): Array[String] =
      toks.sliding(n).map(_.mkString(" ")).toArray.distinct

    /** base hash into [0, P31); any stable hash works — the oracle checks
      * outputs, not internals (candidate recall is what matters) */
    def baseHash(s: String): Long =
      math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s).toLong, P31)

    /** minhash signature under h_i(x) = (a_i·x + b_i) mod P31 */
    def signature(hs: Array[Long], a: Array[Long], b: Array[Long]): Array[Long] = {
      val sig = new Array[Long](a.length)
      var i = 0
      while (i < a.length) {
        var m = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val v = (a(i) * hs(j) + b(i)) % P31
          if (v < m) m = v
          j += 1
        }
        sig(i) = m
        i += 1
      }
      sig
    }

    /** per-band bucket keys: polynomial combine of the band's rows */
    def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var k = 1125899906842597L
        var r = 0
        while (r < rows) { k = k * 31 + sig(b * rows + r); r += 1 }
        out(b) = k
        b += 1
      }
      out
    }
  }

  /** (doc_id, sh) exploded distinct shingles, docs with >= SHINGLE tokens */
  private def shingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = ShingleUtil.tokens(text)
        if (toks.length < SHINGLE) Iterator.empty
        else ShingleUtil.shingles(toks, SHINGLE).iterator.map(s => (id, s))
      }.toDF("doc_id", "sh")
  }

  // ---------------------------------------------------------------------
  // d01 — exact dedup: one shuffle on the normalized md5 fingerprint
  // ---------------------------------------------------------------------
  private def d01(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(normFingerprint(col("text")).as("fp_norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  private val d01Sql =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_norm,
      |  min(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1""".stripMargin

  // shared exhaustive-jaccard oracle SQL (ground truth for d02 AND d03)
  private val jaccardSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(tk) - ${SHINGLE - 1}),
       |    i -> array_to_string(tk[i:i+${SHINGLE - 1}], ' ')))) AS sh
       |  FROM toks WHERE len(tk) >= $SHINGLE),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter_cnt
       |  FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, inter_cnt, sa.n AS size1, sb.n AS size2,
       |  round(CAST(inter_cnt AS DOUBLE) / (sa.n + sb.n - inter_cnt), 4) AS jaccard
       |FROM inter
       |JOIN sz sa ON sa.doc_id = id1
       |JOIN sz sb ON sb.doc_id = id2
       |WHERE CAST(inter_cnt AS DOUBLE) / (sa.n + sb.n - inter_cnt) >= $JACC_T""".stripMargin

  // ---------------------------------------------------------------------
  // d02 — exhaustive n-gram Jaccard near-dup pairs (ground-truth method)
  // ---------------------------------------------------------------------
  private def d02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, dir)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // pair generation: group per shingle and emit doc-id combinations —
    // one exchange on the shingle vs the self-join's two-sided exchange
    // + hash build (~2-3× faster measured). Trade-off: a pathological
    // ultra-hot shingle concentrates its doc list in one task; the
    // self-join formulation spills better there, and d03 (MinHash-LSH)
    // is the real scale path either way.
    val inter = sh.groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val s = ids.sorted
        for { i <- s.indices.iterator; j <- (i + 1) until s.length }
          yield (s(i), s(j))
      }.toDF("id1", "id2")
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter_cnt"))
    val jacc = col("inter_cnt").cast(DoubleType) /
      (col("size1") + col("size2") - col("inter_cnt"))
    inter
      .join(sz.select(col("doc_id").as("id1"), col("n").as("size1")), "id1")
      .join(sz.select(col("doc_id").as("id2"), col("n").as("size2")), "id2")
      .where(jacc >= JACC_T)
      .select(col("id1"), col("id2"), col("inter_cnt"),
              col("size1"), col("size2"), round(jacc, 4).as("jaccard"))
  }

  // ---------------------------------------------------------------------
  // d03 — MinHash + LSH banding: linear-shuffle candidates, exact verify
  // ---------------------------------------------------------------------
  private val NUM_HASH = 64
  private val BANDS = 16
  private val ROWS = NUM_HASH / BANDS
  // fixed seeded permutation constants: h_i(x) = (a_i*x + b_i) mod (2^31-1)
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NUM_HASH)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
     Array.fill(NUM_HASH)(rnd.nextInt(Int.MaxValue).toLong))
  }

  private def d03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pA = permA; val pB = permB // capture plain arrays in the closure
    // shingle → 64-wide signature → 16 band keys, one tight pass per doc
    val sigDf = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = ShingleUtil.tokens(text)
          if (toks.length < SHINGLE) Iterator.empty
          else {
            val shs = ShingleUtil.shingles(toks, SHINGLE)
            val sig = ShingleUtil.signature(shs.map(ShingleUtil.baseHash), pA, pB)
            Iterator.single((id, shs, ShingleUtil.bandKeys(sig, BANDS, ROWS)))
          }
        }
      }.toDF("doc_id", "shs", "bands")
    val buckets = sigDf.selectExpr(
      "doc_id", "shs", "posexplode(bands) AS (band, bkey)")
    val l = buckets.select(col("band"), col("bkey"),
      col("doc_id").as("id1"), col("shs").as("shs1"))
    val r = buckets.select(col("band"), col("bkey"),
      col("doc_id").as("id2"), col("shs").as("shs2"))
    val cand = l.join(r, Seq("band", "bkey"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("shs1"), col("shs2"))
      .dropDuplicates("id1", "id2")
    // exact verification on candidates only
    val interC = size(array_intersect(col("shs1"), col("shs2")))
    val verified = cand
      .withColumn("inter_cnt", interC.cast(LongType))
      .withColumn("size1", size(col("shs1")).cast(LongType))
      .withColumn("size2", size(col("shs2")).cast(LongType))
    val jacc = col("inter_cnt").cast(DoubleType) /
      (col("size1") + col("size2") - col("inter_cnt"))
    verified.where(jacc >= JACC_T)
      .select(col("id1"), col("id2"), col("inter_cnt"),
              col("size1"), col("size2"), round(jacc, 4).as("jaccard"))
  }

  // ---------------------------------------------------------------------
  // d04 — SimHash-32 near-dup: pigeonhole chunk candidates (EXACT for
  //        hamming <= 3 with 4 chunks), verify with bit_count(xor)
  // ---------------------------------------------------------------------
  private val HAM_T = 3
  private val CHUNKS = HAM_T + 1 // pigeonhole: <=3 diff bits => equal chunk
  private val CHUNK_BITS = 32 / CHUNKS // 8

  /** 32-bit simhash from the doc's distinct tokens, using the first 32
    * bits of md5 as the token hash (portable to the SQL oracle).
    * One imperative eval per row (expressions.SimHash32) instead of the
    * 32-lambda interpreted HOF chain it replaced — same values. */
  private def simhash32(text: Column): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge => ExpressionUtils}
    ExpressionUtils.column(graft.functions.expressions.SimHash32(
      ExpressionUtils.expression(array_distinct(split(text, "\\s+")))))
  }

  private def d04(spark: SparkSession, dir: String): DataFrame = {
    val sims = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash32(col("text")).as("sim"))
    // candidates: docs sharing any 8-bit chunk of the signature
    val chunks = sims.select(col("doc_id"), col("sim"),
      explode(transform(sequence(lit(0), lit(CHUNKS - 1)), i => struct(
        i.as("ci"),
        (shiftright(col("sim"), 0).cast(DoubleType) / pow(lit(2.0), i * CHUNK_BITS))
          .cast(LongType).%(1L << CHUNK_BITS).as("chunk")))).as("cc"))
      .select(col("doc_id"), col("sim"),
              col("cc.ci").as("ci"), col("cc.chunk").as("chunk"))
    val l = chunks.select(col("ci"), col("chunk"),
      col("doc_id").as("id1"), col("sim").as("sim1"))
    val r = chunks.select(col("ci"), col("chunk"),
      col("doc_id").as("id2"), col("sim").as("sim2"))
    // evaluate the cheap hamming predicate BEFORE the pair dedup: the
    // weakly-discriminating corpus makes chunk buckets fat, so candidates
    // vastly outnumber survivors — dedup only what passes
    l.join(r, Seq("ci", "chunk")).where(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .where(col("hamming") <= HAM_T)
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), col("sim1"), col("sim2"), col("hamming"))
  }

  private val d04Sql = {
    val hs = """list_transform(list_distinct(string_split_regex(text, '\s+')),
               | t -> CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT))""".stripMargin
    val simExpr =
      s"""CAST(list_sum(list_transform(generate_series(0, 31), b ->
         |  CASE WHEN list_sum(list_transform($hs,
         |    h -> 2 * (CAST(floor(h / power(2, b)) AS BIGINT) % 2) - 1)) > 0
         |  THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin
    s"""WITH sims AS (SELECT doc_id, $simExpr AS sim FROM documents)
       |SELECT a.doc_id AS id1, b.doc_id AS id2, a.sim AS sim1, b.sim AS sim2,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $HAM_T""".stripMargin
  }

  // ---------------------------------------------------------------------
  // d05 — embedding-cosine near-dup pairs (exhaustive double-precision)
  // ---------------------------------------------------------------------
  private val COS_T = 0.45

  private def d05(spark: SparkSession, dir: String): DataFrame = {
    // norms computed once per vector (2N sqrt's), not once per pair (N²)
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("va"),
                     col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("vb"),
                     col("nrm").as("nb"))
    val cos = graft.functions.VectorFunctions.cosinePrenormed(
      col("va"), col("vb"), col("na"), col("nb"))
    a.crossJoin(b).where(col("id1") < col("id2"))
      .withColumn("cos", cos)
      .where(col("cos") >= COS_T)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos_sim"))
  }

  private val d05Sql = {
    def dotE(x: String, y: String) =
      s"""list_sum(list_transform(generate_series(1, len($x)), i ->
         |  CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  round(${dotE("a.embedding", "b.embedding")} /
       |    (sqrt(${dotE("a.embedding", "a.embedding")}) *
       |     sqrt(${dotE("b.embedding", "b.embedding")})), 4) AS cos_sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${dotE("a.embedding", "b.embedding")} /
       |    (sqrt(${dotE("a.embedding", "a.embedding")}) *
       |     sqrt(${dotE("b.embedding", "b.embedding")})) >= $COS_T""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("d01_dedup_exact", d01, Some(d01Sql)),
    QuerySpec("d02_dedup_ngram_jaccard", d02, Some(jaccardSql)),
    QuerySpec("d03_dedup_minhash_lsh", d03, Some(jaccardSql)),
    QuerySpec("d04_dedup_simhash", d04, Some(d04Sql)),
    QuerySpec("d05_dedup_embedding", d05, Some(d05Sql)))
}
