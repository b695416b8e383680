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

  /** the pre-truncation plan + its loop-scoped caches, exposed so
    * PlanSpec can pin the one-exchange-per-iteration shape (the
    * returned g01 frame is localCheckpoint-truncated — its plan is just
    * Scan ExistingRDD) */
  private[graft] def g01Plan(spark: SparkSession,
                             dir: String): (DataFrame, Seq[DataFrame]) = {
    // t06's bigram statistic as graph structure — the SHARED substrate
    // (TextAnalysis.wordPairs) the whole lexical-graph family builds on
    val pairs = TextAnalysis.wordPairs(spark, dir)
    // ONE standing partitioning for the whole loop (round-8 verdict:
    // the pre-shuffle cache made every iteration re-exchange BOTH join
    // sides). edges are cached already hash-partitioned on the join
    // key `a`; outW derives from them with zero exchange and inherits
    // the alignment; nodes are cached hash-partitioned on `node` by
    // their own distinct. Each iteration's ranks side arrives hash(node)
    // from the previous round's aggregate and the node→a rename is
    // alias-preserving, so the only per-round exchange left is the
    // unavoidable contribution flip (b's inflow must reach node
    // partitioning) — the plan you'd want at a billion edges, where
    // re-exchanging the edge table five times IS the job's cost.
    val edges = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= PR_MIN_W)
      .repartition(col("a"))
      .cache()
    val outW = edges.groupBy(col("a")).agg(sum(col("w")).as("wout")).cache()
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
        // DECIMAL(38,0) product: r ≤ SCALE (1e12) and a hot bigram's w
        // can reach ~1e10 on a web corpus — the Int64 product would
        // overflow at ~1e22 (the KMV mixer's lesson, applied here);
        // the quotient is ≤ r, so the result stays BIGINT
        .select(col("b").as("node"),
          expr("(CAST(r AS DECIMAL(38,0)) * w) div wout").as("c"))
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
    (out, Seq(edges, outW, nodes))
  }

  private def g01(spark: SparkSession, dir: String): DataFrame = {
    val (plan, caches) = g01Plan(spark, dir)
    val out = plan.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  private val g01Sql = {
    def contribCte(c: String, rPrev: String) =
      s"""$c AS (
         |  SELECT e.b AS node,
         |    CAST(SUM((CAST(r.r AS HUGEINT) * e.w) // ow.wout) AS BIGINT)
         |      AS inflow
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

  // ---------------------------------------------------------------------
  // g02 — triangle counting over the UNDIRECTED word co-occurrence
  //       graph (clustering-structure analytics — the local-density
  //       statistic next to g01's global authority): per-node triangle
  //       participation counts, top-TRI_TOP by count.
  //
  //       Degree-ordered orientation (the standard distributed
  //       triangle-count bound — Suri & Vassilvitskii 2011): orient
  //       every undirected edge from its lower to its higher endpoint
  //       under the TOTAL order (degree, node), then each triangle has
  //       exactly ONE vertex with two out-edges, so wedges (two
  //       out-edges of one node, dsts ordered) joined against the
  //       oriented edge set count each triangle exactly once. Because
  //       edges point toward HIGHER degree, out-degrees are bounded by
  //       O(√m) — the wedge volume Σ d_out² stays near-linear even
  //       when a hub word touches everything, which is precisely the
  //       skew profile of co-occurrence graphs.
  //
  //       Determinism: the order key is the STRING lpad(deg)|node —
  //       zero-padded so lexicographic comparison IS (deg, node) order
  //       in both engines; counts are integer. No floating point.
  //
  //       100 TB shape: corpus touches only the bigram count (bounded
  //       pair space, as g01); after that every stage is graph-sized —
  //       one exchange for degrees, one self-join exchange on the
  //       wedge apex, one (dst, dst) exchange to close wedges, one
  //       count per node. Edge set caches for its three uses and
  //       unpersists behind the lineage-truncated ≤TRI_TOP result.
  // ---------------------------------------------------------------------
  private val TRI_MIN_W = 3L
  private val TRI_TOP = 100

  /** the full counting plan BEFORE lineage truncation, plus the cached
    * edge frames it reuses — the gated g02 materializes the plan via
    * localCheckpoint and unpersists the caches; PlanSpec pins the
    * uncached shape directly */
  private[graft] def g02Plan(spark: SparkSession, dir: String,
                             cache: Boolean = false): (DataFrame, Seq[DataFrame]) = {
    def hold(df: DataFrame) = if (cache) df.cache() else df
    val pairs = TextAnalysis.wordPairs(spark, dir)
    val und = hold(pairs.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
              greatest(col("a"), col("b")).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .where(col("w") >= TRI_MIN_W)
      .select(col("u"), col("v")))
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val keyed = deg.select(col("node"),
      concat(lpad(col("deg").cast("string"), 12, "0"),
             lit("|"), col("node")).as("k"))
    val e = hold(und
      .join(keyed.select(col("node").as("u"), col("k").as("ku")), Seq("u"))
      .join(keyed.select(col("node").as("v"), col("k").as("kv")), Seq("v"))
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("d"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kd")))
    // wedges: two out-edges of one apex, dsts ordered by the orientation
    // key — the closing edge, if present, must then be oriented x→y
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.kd") < col("e2.kd"))
      .select(col("e1.s").as("apex"),
              col("e1.d").as("x"), col("e2.d").as("y"))
    val tri = wedges.join(
      e.select(col("s").as("x"), col("d").as("y")), Seq("x", "y"))
    val out = tri
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      .join(deg, Seq("node"))
      .orderBy(col("tri").desc, col("node")).limit(TRI_TOP)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("tri").desc, col("node"))))
      .select(col("rnk"), col("node").as("word"), col("deg"), col("tri"))
    (out, Seq(und, e))
  }

  private def g02(spark: SparkSession, dir: String): DataFrame = {
    val (plan, caches) = g02Plan(spark, dir, cache = true)
    val out = plan.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  private val g02Sql =
    s"""WITH tk AS (
       |  SELECT list_filter(string_split_regex(text, '\\s+'), s -> s <> '')
       |    AS tk FROM documents),
       |p0 AS (
       |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
       |    i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
       |  FROM tk WHERE len(tk) >= 2),
       |und AS (
       |  SELECT least(p.a, p.b) AS u, greatest(p.a, p.b) AS v
       |  FROM p0 WHERE p.a <> p.b
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $TRI_MIN_W),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
       |  GROUP BY 1),
       |keyed AS (
       |  SELECT node, lpad(CAST(deg AS VARCHAR), 12, '0') || '|' || node
       |    AS k FROM deg),
       |e AS (
       |  SELECT CASE WHEN ku.k < kv.k THEN und.u ELSE und.v END AS s,
       |         CASE WHEN ku.k < kv.k THEN und.v ELSE und.u END AS d,
       |         CASE WHEN ku.k < kv.k THEN kv.k  ELSE ku.k  END AS kd
       |  FROM und JOIN keyed ku ON und.u = ku.node
       |           JOIN keyed kv ON und.v = kv.node),
       |tri AS (
       |  SELECT e1.s AS apex, e1.d AS x, e2.d AS y
       |  FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.kd < e2.kd
       |  JOIN e e3 ON e3.s = e1.d AND e3.d = e2.d),
       |cnt AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
       |    SELECT apex AS node FROM tri
       |    UNION ALL SELECT x AS node FROM tri
       |    UNION ALL SELECT y AS node FROM tri)
       |  GROUP BY 1)
       |SELECT rnk, word, deg, tri FROM (
       |  SELECT cnt.node AS word, deg.deg, cnt.tri,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cnt.tri DESC, cnt.node) AS INT)
       |      AS rnk
       |  FROM cnt JOIN deg ON cnt.node = deg.node) t
       |WHERE rnk <= $TRI_TOP""".stripMargin

  // ---------------------------------------------------------------------
  // g03 — weighted label propagation (Raghavan et al. 2007) over the
  //       user CO-ACTIVITY graph: community detection, the third
  //       fixed-point shape beside g01's authority and g02's local
  //       density. Substrate: users are adjacent when they act in the
  //       same (event_type, hour) activity bucket, edge weight = how
  //       many buckets they share, thresholded at LPA_MIN_W — the
  //       standard event-log-to-graph construction (the word graph is
  //       NOT usable here: this corpus's 31-word vocabulary makes any
  //       lexical graph a near-clique, on which LPA provably collapses
  //       to one label). Every node starts labeled with itself; each
  //       synchronous round it adopts the label with the highest
  //       incident edge-weight mass among its neighbors; after
  //       LPA_ITERS rounds the label sets are the detected co-activity
  //       communities (top-LPA_TOP by size — 5/20/62 nontrivial
  //       communities at sf 0.001/0.01/0.1).
  //
  //       Determinism: classic LPA breaks ties randomly and oscillates;
  //       this formulation is bit-reproducible — integer weight sums,
  //       ties on (vote desc, label asc), a FIXED round count, and
  //       synchronous updates — so the oracle replays the identical
  //       fixed point as unrolled CTEs.
  //
  //       100 TB shape: the event log collapses to DISTINCT (type,
  //       hour, user) rows in one exchange; pair generation is a
  //       self-join within activity buckets, CAPPED by LPA_SUB-member
  //       sub-buckets (p02's SemDeDup cap applied to the event side —
  //       the ×16 densified probe measured the uncapped self-join at
  //       110 s where the capped one stays linear): bucket members
  //       rank by user_id, only same-sub-bucket pairs meet, so a
  //       mega-bucket costs O(size·LPA_SUB) pairs instead of size².
  //       The gate corpora's buckets (≤10 users) sit inside one
  //       sub-bucket, so the cap provably changes nothing there (a
  //       spec pins cap→∞ equality). Each LPA round is graph-sized:
  //       one join of (node, label) to the edge list, one exchange
  //       onto (node, label) for the vote sum, and a KEY-PARTITIONED
  //       window for the argmax — per-task memory bounded by one
  //       node's candidate labels, never a global sort. Edges cache
  //       across rounds and unpersist behind the truncated result.
  // ---------------------------------------------------------------------
  private val LPA_MIN_W = 3L
  private val LPA_ITERS = 3
  private val LPA_TOP = 100
  private val LPA_SUB = 16

  private def g03(spark: SparkSession, dir: String): DataFrame =
    g03Communities(spark, dir, LPA_SUB)

  /** cap-parameterized entry so the spec can pin that the production
    * cap is inactive on the gate corpora (cap→∞ equality) */
  private[graft] def g03Communities(spark: SparkSession, dir: String,
                                    sub: Int): DataFrame = {
    val b = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
              col("user_id")).distinct()
      .withColumn("sub", expr(
        s"CAST((row_number() OVER (PARTITION BY event_type, h" +
          s" ORDER BY user_id) - 1) div $sub AS INT)"))
    val und = b.as("a").join(b.as("b2"),
        col("a.event_type") === col("b2.event_type") &&
        col("a.h") === col("b2.h") &&
        col("a.sub") === col("b2.sub") &&
        col("a.user_id") < col("b2.user_id"))
      .groupBy(col("a.user_id").as("u"), col("b2.user_id").as("v"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= LPA_MIN_W)
    // both directions: a vote flows across every incident edge
    val e2 = und.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .union(und.select(col("v").as("src"), col("u").as("dst"), col("w")))
      .cache()
    var labels = e2.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    // ONE exchange per round (round 19 — g01's standing-partitioning
    // audit extended here, VERDICT #7): the explicit hash(node)
    // repartition is the unavoidable vote flip, and BOTH aggregations
    // ride it — hash(node) clusters (node, lbl) for the vote sum, and
    // the aggregate's alias-aware output partitioning carries it into
    // the per-node argmax — where the previous shape paid an exchange
    // for the (node, lbl) groupBy and ANOTHER for the argmax window.
    // The argmax itself is max_by over (vw, −lbl): max vote weight,
    // ties to the SMALLEST label — bit-identical to the old
    // row_number() over (vw DESC, lbl ASC) tie-break, without the
    // window's per-partition sort.
    for (_ <- 1 to LPA_ITERS) {
      labels = e2
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("lbl"), col("w"))
        .repartition(col("node"))
        .groupBy(col("node"), col("lbl"))
        .agg(sum(col("w")).as("vw"))
        .groupBy(col("node"))
        .agg(max_by(col("lbl"), struct(col("vw"), -col("lbl"))).as("lbl"))
    }
    val out = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("lbl")).limit(LPA_TOP)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_members").desc, col("lbl"))))
      .select(col("rnk"), col("lbl").as("community"), col("n_members"))
      .localCheckpoint(true)
    e2.unpersist()
    out
  }

  private val g03Sql = {
    def round(i: Int) =
      s"""v$i AS (
         |  SELECT e.dst AS node, l.lbl, CAST(SUM(e.w) AS BIGINT) AS vw
         |  FROM e2 e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY vw DESC, lbl) AS rn FROM v$i) t
         |  WHERE rn = 1)""".stripMargin
    s"""WITH b0 AS (
       |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
       |  FROM events),
       |b AS (
       |  SELECT event_type, h, user_id,
       |    CAST((ROW_NUMBER() OVER (PARTITION BY event_type, h
       |      ORDER BY user_id) - 1) // $LPA_SUB AS INT) AS sub
       |  FROM b0),
       |und AS (
       |  SELECT a.user_id AS u, b2.user_id AS v,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM b a JOIN b b2 USING (event_type, h, sub)
       |  WHERE a.user_id < b2.user_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $LPA_MIN_W),
       |e2 AS (
       |  SELECT u AS src, v AS dst, w FROM und
       |  UNION ALL SELECT v AS src, u AS dst, w FROM und),
       |l0 AS (
       |  SELECT node, node AS lbl FROM (
       |    SELECT DISTINCT src AS node FROM e2)),
       |${(1 to LPA_ITERS).map(round).mkString(",\n")}
       |SELECT rnk, community, n_members FROM (
       |  SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lbl) AS INT)
       |      AS rnk
       |  FROM l$LPA_ITERS GROUP BY lbl) t
       |WHERE rnk <= $LPA_TOP""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("g01_word_pagerank", g01, Some(g01Sql)),
    QuerySpec("g02_triangle_count", g02, Some(g02Sql)),
    QuerySpec("g03_label_propagation", g03, Some(g03Sql)))
}
