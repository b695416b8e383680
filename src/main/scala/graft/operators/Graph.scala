package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QuerySpec, Tables}

/** Iterative graph analytics over corpus-derived graphs — the second
  * graph op family after d07's connected components (which resolves
  * dup clusters). Reference repo has no graph surface; this is §2.2
  * north-star breadth: the fixed-point iteration shape (PageRank,
  * label propagation, SimRank…) that a pure SQL engine can't express
  * and a training-data pipeline uses for site/document authority
  * weighting (e.g. Common Crawl harmonic-centrality filtering).
  */
object Graph {

  // ---------------------------------------------------------------------
  // g01 — weighted PageRank over the word co-occurrence graph: directed
  //       edges a→b for adjacent token pairs (t06's bigram statistic as
  //       graph structure), edge weight = corpus bigram count, damping
  //       0.85, PR_ITERS fixed iterations, top-PR_TOP by rank.
  //
  //       Determinism across engines: ranks live in SCALED INTEGER
  //       units (1e-12) and every step is integer arithmetic — r0 =
  //       SCALE div N, per-edge contribution (r·w) div w_out, update
  //       (15·r0) div 100 + (85·inflow) div 100 — so both engines walk
  //       bit-identical rank vectors and the oracle (the same five
  //       iterations unrolled as chained CTEs) hash-matches exactly.
  //       Integer sums are order-exact; no floating point anywhere.
  //       Dangling mass (nodes with no out-edges) leaks, the standard
  //       fixed-iteration simplification — ranks order identically.
  //
  //       100 TB shape: the ONLY corpus-scale stage is the bigram
  //       count — one exchange on the bounded pair space (word-type²
  //       intersected with observed adjacency, millions of keys for a
  //       web corpus, independent of corpus size). The five iterations
  //       run over that bounded graph: per iteration one hash exchange
  //       of (node, contribution) pairs — the textbook distributed
  //       PageRank round. Edges/out-weights cache once and are
  //       unpersisted before return (the d07 loop-scoped discipline);
  //       the result is lineage-truncated via localCheckpoint so the
  //       loop's plan tree never re-evaluates downstream.
  // ---------------------------------------------------------------------
  private val PR_ITERS = 5
  private val PR_MIN_W = 3L
  private val PR_SCALE = 1000000000000L // 1e-12 rank units
  private val PR_TOP = 100

  private def g01(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(expr("filter(split(text, '\\\\s+'), s -> s != '')").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> struct(tk[i] AS a, tk[i + 1] AS b))")).as("p"))
      .select(col("p.a"), col("p.b"))
    val edges = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= PR_MIN_W)
      .cache()
    val outW = edges.groupBy(col("a")).agg(sum(col("w")).as("wout"))
    val nodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct().cache()
    val n = nodes.count() // one scalar action; sizes r0 like t05's idf
    val r0 = PR_SCALE / n
    val base = (15L * r0) / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("r"))
    for (_ <- 1 to PR_ITERS) {
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
        .join(outW, Seq("a"))
        .select(col("b").as("node"), expr("(r * w) div wout").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("r"))
    }
    val out = ranks
      .orderBy(col("r").desc, col("node")).limit(PR_TOP)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("r").desc, col("node"))))
      .select(col("rnk"), col("node").as("word"), col("r").as("rank_scaled"))
      .localCheckpoint(true)
    edges.unpersist()
    nodes.unpersist()
    out
  }

  private val g01Sql = {
    def contribCte(c: String, rPrev: String) =
      s"""$c AS (
         |  SELECT e.b AS node,
         |    CAST(SUM((r.r * e.w) // ow.wout) AS BIGINT) AS inflow
         |  FROM e JOIN $rPrev r ON e.a = r.node JOIN ow ON e.a = ow.a
         |  GROUP BY 1)""".stripMargin
    def rankCte(rNext: String, c: String) =
      s"""$rNext AS (
         |  SELECT nodes.node,
         |    CAST((15 * ($PR_SCALE // n.n)) // 100
         |      + (85 * COALESCE(c.inflow, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN n LEFT JOIN $c c USING (node))""".stripMargin
    val rounds = (1 to PR_ITERS).map(i =>
      contribCte(s"c$i", s"r${i - 1}") + ",\n" + rankCte(s"r$i", s"c$i"))
      .mkString(",\n")
    s"""WITH tk AS (
       |  SELECT list_filter(string_split_regex(text, '\\s+'), s -> s <> '')
       |    AS tk FROM documents),
       |e0 AS (
       |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
       |    i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
       |  FROM tk WHERE len(tk) >= 2),
       |e AS (
       |  SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM e0 GROUP BY 1, 2 HAVING COUNT(*) >= $PR_MIN_W),
       |ow AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY 1),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (
       |  SELECT node, CAST($PR_SCALE // n.n AS BIGINT) AS r
       |  FROM nodes CROSS JOIN n),
       |$rounds
       |SELECT rnk, node AS word, rank_scaled FROM (
       |  SELECT node, r AS rank_scaled,
       |    CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS INT) AS rnk
       |  FROM r$PR_ITERS) t
       |WHERE rnk <= $PR_TOP""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("g01_word_pagerank", g01, Some(g01Sql)))
}
