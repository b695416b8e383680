package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QuerySpec, Tables}
import graft.functions.VectorFunctions.{cosinePrenormed, norm}

/** Similarity search over the `embeddings` table (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale posture: the brute-force scorer broadcasts the (small) query
  * set and scores in a single codegen'd pass over the corpus — no
  * shuffle of raw vectors; only (query_id, score) pairs move. The LSH
  * variant additionally prunes the corpus to the query's signature
  * bucket, turning the scan into a bucket-local probe (the IVF/LSH
  * pattern used by ANN systems); recall is traded via the plane count.
  *
  * Determinism: dot products fold left-to-right in double precision
  * (see VectorFunctions), so scores — and therefore rankings, bucket
  * signs, and the DuckDB oracle — are bit-stable. The LSH hyperplanes
  * are fixed seeded constants rounded to 6 decimals, embedded
  * identically in the Scala plan and the generated oracle SQL.
  */
object Similarity {

  private val DIM = 64
  private val TOP_K = 5
  private val N_QUERIES = 10 // vec_id < 10 are the query vectors

  /** DuckDB double-precision cosine between embedding columns, matching
    * VectorFunctions.cosine's fold order. */
  private def sqlCos(x: String, y: String): String = {
    def d(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $DIM), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"(${d(x, y)} / (sqrt(${d(x, x)}) * sqrt(${d(y, y)})))"
  }

  // ---------------------------------------------------------------------
  // s01 — brute-force cosine top-k (exact k-NN baseline)
  // ---------------------------------------------------------------------
  private def s01(spark: SparkSession, dir: String): DataFrame = {
    // norms once per vector; the scoring pass then does one dot per pair
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
              col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(e.select(col("vec_id").as("neighbor_id"),
                     col("embedding").as("nv"), col("nrm").as("nn")),
            col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= TOP_K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
              round(col("cos"), 4).as("cos_sim"))
  }

  private[operators] val s01Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id < $N_QUERIES),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    ${sqlCos("qv", "e.embedding")} AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> query_id)
       |SELECT query_id, neighbor_id, rnk, round(cos, 4) AS cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $TOP_K""".stripMargin

  // ---------------------------------------------------------------------
  // s02 — LSH-bucketed approximate top-k (random hyperplane signatures)
  // ---------------------------------------------------------------------
  private val N_PLANES = 6 // 64 buckets
  /** fixed seeded gaussian hyperplanes, rounded to 6 decimals so the
    * identical constants embed in both the Scala plan and the oracle SQL */
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(N_PLANES, DIM)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)
  }

  /** plane-side dot product: embedding (float) × plane literal (double) */
  private def planeDot(v: Column, p: Array[Double]): Column =
    graft.functions.VectorFunctions.dot(
      v, array(p.map(lit(_)).toIndexedSeq: _*))

  private def bucketOf(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(planeDot(v, p) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  private def s02(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("bucket", bucketOf(col("embedding")))
      .withColumn("nrm", norm(col("embedding")))
    val q = e.where(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
              col("bucket"), col("nrm").as("qn"))
    // probe only the query's bucket: candidate set shrinks ~64×
    val scored = broadcast(q)
      .join(e.select(col("vec_id").as("neighbor_id"),
                     col("embedding").as("nv"), col("bucket"),
                     col("nrm").as("nn")),
            Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= TOP_K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
              round(col("cos"), 4).as("cos_sim"))
  }

  private val s02Sql = {
    def planeLit(p: Array[Double]): String =
      p.map(x => if (x == math.rint(x)) f"$x%.1f" else x.toString)
        .mkString("[", ", ", "]")
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"""CASE WHEN list_sum(list_transform(generate_series(1, $DIM),
         |  i -> CAST(embedding[i] AS DOUBLE) * (${planeLit(p)})[i])) >= 0
         |  THEN ${1 << i} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, bucket FROM b
       |  WHERE vec_id < $N_QUERIES),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    ${sqlCos("qv", "e.embedding")} AS cos
       |  FROM q JOIN b e USING (bucket) WHERE e.vec_id <> query_id)
       |SELECT query_id, neighbor_id, rnk, round(cos, 4) AS cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $TOP_K""".stripMargin
  }

  // ---------------------------------------------------------------------
  // s03 — top-k via custom typed Aggregator (map-side partial top-k):
  //       the exchange carries O(queries·k) rows instead of every scored
  //       row as in the window formulation; output ≡ s01 (same oracle)
  // ---------------------------------------------------------------------
  private def s03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.where(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
              col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(e.select(col("vec_id").as("neighbor_id"),
                     col("embedding").as("nv"), col("nrm").as("nn")),
            col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"),
              col("neighbor_id"),
              cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .as[(Long, Long, Double)]
    val agg = new graft.functions.TopKAggregator(TOP_K)
    scored.groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (qid, topk) =>
        topk.zipWithIndex.map { case ((nid, cos), i) => (qid, nid, i + 1, cos) }
      }
      .toDF("query_id", "neighbor_id", "rnk", "cos")
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
              round(col("cos"), 4).as("cos_sim"))
  }

  // ---------------------------------------------------------------------
  // s04 — IVF-style approximate top-k: a coarse quantizer assigns every
  //       vector to its nearest centroid (here: a fixed seeded subset of
  //       the corpus — a deterministic one-step quantizer, so the oracle
  //       can reproduce the assignment in SQL), and each query probes
  //       ONLY its own cell. Assignment is a linear N×K broadcast pass;
  //       the probe shrinks the scan ~K×. nprobe=1 keeps the op
  //       deterministic; recall is traded via K and nprobe exactly as in
  //       IVF-flat ANN systems.
  // ---------------------------------------------------------------------
  private val N_CENTROIDS = 16

  private def s04(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val cents = e.where(col("vec_id") < N_CENTROIDS)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
              col("nrm").as("cn"))
    // coarse assignment: nearest centroid by cosine (ties → lowest cid)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos_c",
        cosinePrenormed(col("embedding"), col("cv"), col("nrm"), col("cn")))
      .withColumn("arn", row_number().over(wAssign))
      .where(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"),
              col("cid").as("cluster"))
    val q = assigned.where(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
              col("nrm").as("qn"), col("cluster"))
    // probe only the query's cell
    val scored = broadcast(q)
      .join(assigned.select(col("vec_id").as("neighbor_id"),
                            col("embedding").as("nv"), col("nrm").as("nn"),
                            col("cluster")),
            Seq("cluster"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= TOP_K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
              round(col("cos"), 4).as("cos_sim"))
  }

  private val s04Sql =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding AS cv FROM e
       |      WHERE vec_id < $N_CENTROIDS),
       |assigned AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, c.cid AS cluster,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${sqlCos("e.embedding", "c.cv")} DESC, c.cid) AS arn
       |    FROM e CROSS JOIN c) t
       |  WHERE arn = 1),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, cluster FROM assigned
       |  WHERE vec_id < $N_QUERIES),
       |scored AS (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |    ${sqlCos("qv", "a.embedding")} AS cos
       |  FROM q JOIN assigned a USING (cluster)
       |  WHERE a.vec_id <> query_id)
       |SELECT query_id, neighbor_id, rnk, round(cos, 4) AS cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $TOP_K""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("s01_knn_bruteforce", s01, Some(s01Sql)),
    QuerySpec("s02_knn_lsh", s02, Some(s02Sql)),
    QuerySpec("s03_knn_topk_aggregator", s03, Some(s01Sql)),
    QuerySpec("s04_knn_ivf", s04, Some(s04Sql)))
}
