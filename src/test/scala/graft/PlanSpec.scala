package graft

import org.apache.spark.sql.execution.{CodegenMode, FormattedMode}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these
  * operators survive a 100× scale-up are plan shapes, not just values —
  * pin them. */
class PlanSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q02 pushes filters into the parquet scan and prunes columns") {
    val p = formatted("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // projection pruning: untouched wide columns never reach the scan
    assert(!p.contains("l_returnflag") && !p.contains("l_tax"))
  }

  test("q04 star joins broadcast the dimension tables") {
    assert(formatted("q04_broadcast_star_join").contains("BroadcastHashJoin"))
  }

  test("q09 global top-k plans as TakeOrderedAndProject (no full sort)") {
    assert(formatted("q09_topk").contains("TakeOrderedAndProject"))
  }

  test("s01 broadcasts the query side of the kNN scoring join") {
    val p = formatted("s01_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("d05 all-pairs runs as a tiled equi-join, never a nested loop") {
    val p = formatted("d05_dedup_embedding")
    assert(!p.contains("CartesianProduct"),
      "d05 must not plan a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "d05 must not plan a nested-loop join")
  }

  test("d06 LSH candidates join on (band, bkey), no nested loop") {
    val p = formatted("d06_dedup_embedding_lsh")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("bkey"))
  }

  test("s04 IVF argmin and top-k aggregate map-side (no window/sort shuffle)") {
    // the round-4 scale-killer: a row_number window argmin sort-shuffled
    // all n·√n scored assignment rows; the typed reduceGroups/aggregator
    // formulation must plan as (Object)HashAggregate with map-side
    // partials — no Window, no Sort of the scored pass anywhere
    val p = formatted("s04_knn_ivf")
    assert(!p.contains("Window"), "s04 must not plan window functions")
    assert(!p.contains("SortAggregate") && !p.contains("SortMergeJoin"),
      "s04 argmin/top-k must not fall back to sort-based operators")
    assert(p.contains("ObjectHashAggregate"))
  }

  test("s02 LSH top-k aggregates map-side (no window)") {
    val p = formatted("s02_knn_lsh")
    assert(!p.contains("Window"))
    assert(p.contains("ObjectHashAggregate"))
  }

  test("s02 multi-probe keeps the broadcast bucket-join shape") {
    // the probe explode multiplies only the tiny broadcast query side;
    // the corpus must still arrive through a broadcast hash join on the
    // bucket key — never a sort-merge shuffle or a nested loop
    val p = operators.Similarity.s02Probe(spark, sfDir, nflips = 4)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"))
  }

  test("x07 read is partition-pruned on the lang predicate") {
    val p = formatted("x07_partitioned_write")
    assert(p.contains("PartitionFilters") && p.contains("lang"))
  }

  test("x09 bucketed join and key-local agg plan with zero exchanges") {
    val p = formatted("x09_bucketed_join")
    assert(p.contains("SortMergeJoin"))
    assert(p.contains("Bucketed: true"), "scans must read bucketed layout")
    assert(!p.contains("Exchange"),
      "bucketed co-located join must not shuffle")
  }

  test("x10 skew join runs sort-merge with the salt in the join keys") {
    // the pattern only mitigates skew if the hot key's rows actually
    // spread over the salt sub-keys: the shuffle/join must be keyed on
    // (skey, salt), and broadcast must not quietly dodge the case the
    // op demonstrates (two large sides)
    val p = formatted("x10_skew_salted_join")
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"))
    // FormattedMode prints the SMJ keys as a "Left keys [n]: [...]" line
    val joinKeys = "Left keys[^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(joinKeys.contains("skey") && joinKeys.contains("salt"),
      s"join must be keyed on (skey, salt), got [$joinKeys]")
  }

  test("q01 aggregation is whole-stage codegen'd") {
    val p = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .queryExecution.explainString(CodegenMode)
    assert(p.contains("WholeStageCodegen"))
  }

  test("q25 grouping sets run as ONE scan + Expand, not unioned groupBys") {
    val p = formatted("q25_grouping_sets")
    assert(p.contains("Expand"))
    assert(!p.contains("Union"))
    // one pass over the fact table: exactly one parquet scan node (the
    // tree prints a node as "Scan parquet (id)"; its details section
    // repeats it as "(id) Scan parquet", which must not be counted)
    assert("Scan parquet *\\(".r.findAllIn(p).size === 1)
  }

  test("t07 repetition signals are shuffle-free (one codegen pass)") {
    val p = formatted("t07_repetition")
    assert(!p.contains("Exchange"))
  }

  test("t14 filter verdict is shuffle-free (one codegen pass)") {
    val p = formatted("t14_filter_verdict")
    assert(!p.contains("Exchange"))
  }

  test("s08 SQ8 search: typed top-k, broadcast rerank, no window/sort") {
    // both ranking stages run through the map-side TopKAggregator
    // (ObjectHashAggregate) — a Window/global-Sort here would shuffle
    // every scored row; the rerank side must meet the corpus through
    // broadcast joins of the tiny candidate/query sets only
    val p = formatted("s08_knn_sq8_rerank")
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("Window"), "ranking must not plan a Window")
    assert(!p.contains("SortMergeJoin"), "rerank joins must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("s13 matryoshka: typed top-k both stages, broadcast rerank, no window") {
    // the prefix scan streams the corpus against the broadcast query
    // side (the deliberate s01-style BNLJ on =!=); both ranking stages
    // ride the map-side TopKAggregator; the full-dim rerank meets the
    // corpus only through broadcast joins of the candidate/query sets
    val p = formatted("s13_knn_matryoshka")
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("Window"), "ranking must not plan a Window")
    assert(!p.contains("SortMergeJoin"), "rerank joins must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("m05 frame-pair join is md5-equi, never a cross product") {
    // the df cap bounds the same-fingerprint fan-out; the join itself
    // must be a hash/merge equi-join on frame_md5 — a nested loop here
    // would be frames², payloads or not
    val p = formatted("m05_multimodal_frame_dedup")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x33 change feed classifies via a keyed join, never a cross product") {
    // old'/new row sets (both change-proportional) meet in ONE
    // full-outer equi-join on the table key; DV erasure and the
    // refinement paths are broadcast/anti joins of metadata-scale sets
    val p = formatted("x33_table_change_feed")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x13 SCD2 history windows per key, never a global sort") {
    val p = formatted("x13_scd2_history")
    assert(!p.contains("Exchange SinglePartition"),
      "the interval window must be partitioned by the CDC key")
  }

  test("p03 domain mixing is a narrow scan → hash → explode, no shuffle") {
    val p = formatted("p03_domain_mixing")
    assert(!p.contains("Exchange"))
    assert(p.contains("Generate"), "the epoch expansion must be a Generate")
  }

  test("d08 decontamination broadcasts the benchmark n-gram set") {
    assert(formatted("d08_decontaminate").contains("BroadcastHashJoin"))
  }

  test("t13 scores against a broadcast model, corpus text unshuffled") {
    // the 1024-row log-ratio model must broadcast back onto the feature
    // stream; a sort-merge formulation would shuffle every feature
    // occurrence of the corpus on the bucket key
    val p = formatted("t13_dsir_importance")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("d11 ingest streams the corpus through broadcast joins, no SMJ") {
    // the standing corpus index must never exchange: candidate keys and
    // candidate partners broadcast, everything else streams
    val p = formatted("d11_incremental_ingest")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("p01 pipeline broadcasts eval grams and never goes nested-loop") {
    val p = formatted("p01_clean_corpus")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the whole pipeline reads the corpus ONCE plus the row-group-pruned
    // eval scan — a stateless reformulation that re-derives a stage
    // subtree per consumer planned five full scans
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected 2 parquet scans, saw $scans in:\n$p")
  }

  test("s06 k-means assignment streams the corpus against K broadcast rows") {
    // array-form Lloyd: the ONLY join is corpus × K centroid-array rows
    // — a BroadcastNestedLoopJoin whose build side is K rows of bytes
    // is the correct plan (there is no join key; every vector scores
    // every centroid). What must never happen is a CartesianProduct or
    // the corpus itself on the build side.
    val p = formatted("s06_kmeans")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"),
      "centroids must broadcast as the build side")
    assertBnljStreamsTheScan(p)
  }

  /** Non-vacuous build-side guard for the centroid-assignment joins:
    * every BNLJ must (a) build RIGHT — the broadcast()-hinted centroid
    * arg; if Catalyst ever re-chose sides on size stats the join would
    * render BuildLeft — and (b) stream a subtree that reaches the
    * parquet scan (the corpus pipeline: Scan → Filter/Project …). The
    * streamed subtree is the lines between the `:-` child and its `+-`
    * build sibling at the same indent column. (The first cut checked
    * the line after BroadcastExchange for a scan, which is always a
    * Project/aggregate — a guard that could not fire; and the seed
    * path's build side legitimately holds a vec_id<K FILTERED scan, so
    * 'no scan under broadcast' is not the invariant either.) */
  private def assertBnljStreamsTheScan(p: String): Unit = {
    val lines = p.linesIterator.toVector
    // tree-section lines carry the join type ("… Cross BuildX"); the
    // details section repeats the bare node name — skip those
    val bnlj = lines.zipWithIndex
      .filter(_._1.contains("BroadcastNestedLoopJoin Cross"))
    assert(bnlj.nonEmpty, "expected a centroid-assignment BNLJ")
    bnlj.foreach { case (line, i) =>
      assert(line.contains("Cross BuildRight"),
        s"assignment BNLJ must build on the broadcast centroid side: $line")
      val streamed = lines.lift(i + 1).getOrElse("")
      val indent = streamed.indexOf(":-")
      assert(indent >= 0, s"expected a streamed child under: $line")
      val buildIdx = (i + 2 until lines.length).find { j =>
        lines(j).length > indent + 1 &&
          lines(j).substring(indent).startsWith("+-")
      }.getOrElse(lines.length)
      val subtree = lines.slice(i + 1, buildIdx)
      assert(subtree.exists(_.contains("Scan parquet")),
        s"BNLJ streamed side must be the corpus scan pipeline, saw:\n" +
          subtree.mkString("\n"))
    }
  }

  test("d09 doc frequency runs as one gram exchange, never a join-back") {
    // the stride-1 gram rows are ~L× the corpus — the partition window
    // formulation moves them through ONE exchange; a groupBy-count +
    // join-back re-derives and re-shuffles them (2 scans, 2 full
    // exchanges, a join carrying every gram row)
    val p = formatted("d09_substring_dedup")
    assert(!p.contains("Join"), "d09 must not join grams back to counts")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length === 1,
      "d09 must derive the gram rows once")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"expected ≤2 exchanges (gram window + post-partial-agg doc_id), saw $exchanges")
  }

  test("s07 scores codes against broadcast tables, never raw all-pairs") {
    // the PQ contract: after encoding, only (sub, cluster) codes join a
    // broadcast distance table — a cartesian or nested-loop against raw
    // vectors would defeat the 64× compression the op exists for
    val p = formatted("s07_knn_pq_adc")
    assert(p.contains("BroadcastHashJoin"),
      "codebook/distance-table joins must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("x14 pushes the delta date filter; base comes from the staged parquet") {
    // the refresh contract: the flat table is scanned only ABOVE the
    // split date (the delta); history arrives as the staged partial
    // aggregate. A missing pushdown would re-scan all of orders.
    val p = formatted("x14_incremental_agg")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "delta filter must reach the orders scan")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length === 2,
      "exactly two scans: staged base + delta slice")
  }

  test("x16 apply broadcasts the delta keys; delta ts filter reaches the scan") {
    // the daily-CDC contract: the standing history streams map-side
    // against a broadcast (key → first-delta-ts) table — a shuffled
    // join here would exchange the whole history every refresh — and
    // events is scanned only at/above the split timestamp
    val p = formatted("x16_scd2_apply")
    assert(p.contains("BroadcastHashJoin"),
      "base-close join must broadcast the delta keys")
    assert(p.contains("GreaterThanOrEqual(ts"),
      "delta slice filter must reach the events scan")
    assert(!p.contains("SortMergeJoin"),
      "the history must never shuffle for the apply")
  }

  test("p02 dedup stage pairs within (cluster, sub) — capped, no cartesian") {
    // the only cross joins in the plan are broadcasts of bounded
    // centroid/scalar metadata (the documented k-means shape); the
    // PAIR join itself must stay an equi-join carrying the sub-bucket
    // cap key so a mega-cluster can't go quadratic
    val p = formatted("p02_embedding_curation")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("sub"),
      "within-cluster pair join must carry the sub-bucket cap key")
  }

  test("x15 k-min sketch aggregates map-side, never a rank window") {
    // the sketch's reason to exist is bounded state: the k-min buffer
    // must run as an ObjectHashAggregate with partial buffers (≤k rows
    // per partition reach the exchange), not the oracle's row_number
    // formulation which would sort-shuffle every distinct hash
    val p = graft.operators.ScaleOps.x15Plan(spark, sfDir)._1
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("Window"), "no rank window on the Spark side")
  }

  test("s09 maxsim broadcasts query tokens; scoring never shuffles the corpus") {
    val p = formatted("s09_maxsim_late_interaction")
    assert(!p.contains("SortMergeJoin"), "the ≠-doc join must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ObjectHashAggregate"), "ranked tail via TopKAggregator")
  }

  test("p05 curriculum rank windows per phase; only the 4-row offsets are global") {
    val p = formatted("p05_curriculum_order")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      "only the ≤4-row phase-offset prefix sum may gather to one partition")
  }

  test("q26 generator fan-out runs narrow — Generate with zero exchanges") {
    // the 1→N explosion must happen inside the scan stage; a generator
    // that forced a shuffle would multiply exchange volume by the
    // fan-out factor at 100 TB
    val p = formatted("q26_generator_posexplode")
    assert(p.contains("Generate"), s"expected a Generate operator in:\n$p")
    assert(!p.contains("Exchange"), "generator fan-out must not shuffle")
  }

  test("x11 injects a runtime bloom filter on the fact side of the SMJ") {
    // under x11's scoped confs Catalyst's InjectRuntimeFilter must turn
    // the selective dim predicate into a might_contain guard on the
    // lineitem side before its shuffle — the semi-join reduction the op
    // exists to demonstrate
    val saved = operators.ScaleOps.x11Confs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    operators.ScaleOps.x11Confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = operators.ScaleOps.x11Join(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("might_contain"),
        s"expected an injected bloom filter in:\n$p")
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("BroadcastHashJoin"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("d10 SemDeDup pairs meet through the cluster equi-join only") {
    // the whole point of cluster-then-compare: the pair space is the
    // within-cluster join, never an all-pairs product — at 10^9 vectors
    // a cartesian/BNLJ here is the difference between n·√n and n²
    val p = formatted("d10_semdedup")
    assert(!p.contains("CartesianProduct"),
      "d10 must not plan a cartesian product")
    // the embedded k-means assignment legitimately BNLJs the corpus
    // against K broadcast centroid rows — but every BNLJ in this plan
    // must be exactly that shape (corpus streamed, tiny build side):
    assertBnljStreamsTheScan(p)
    // ...and the PAIR join itself must remain an equi-join on the
    // cluster key — the n² product this op exists to avoid would show
    // up as the pair join degrading to a nested loop
    assert(Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .exists(p.contains),
      "the within-cluster pair join must plan as an equi-join")
  }

  test("x12 pushes both 2-D box predicates into the z-ordered scan") {
    // the layout only pays off if BOTH dimension predicates reach the
    // parquet reader as pushed filters (that is what turns tight
    // per-row-group min/max spans into skipped row groups), and the
    // scan must read only the staged table's needed columns
    val p = formatted("x12_zorder_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThanOrEqual(l_orderkey"),
      s"orderkey predicate must be pushed, got:\n$p")
    assert(p.contains("LessThanOrEqual(l_partkey"),
      s"partkey predicate must be pushed, got:\n$p")
  }

  test("t12 packing plans no full-corpus single-partition window") {
    // the distributed prefix sum's only SinglePartition exchange feeds
    // the ≤32-row shard-base window, downstream of a HashAggregate —
    // the raw-scan side must reach its window via hashpartitioning
    val p = formatted("t12_sequence_packing")
    assert(p.contains("hashpartitioning(shard"),
      s"expected shard hash partitioning in:\n$p")
  }

  test("t18 scoring joins the bounded count tables by key, totals broadcast") {
    // the corpus is scanned only for the two count aggregations; the
    // scoring stage must meet the unigram table through equi-joins and
    // the 1-row totals through a broadcast — never a cartesian of
    // anything unbounded
    val p = graft.operators.TextAnalysis.t18Plan(spark, sfDir)._1
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"),
      "t18 must not plan a cartesian product")
    assert(p.contains("BroadcastNestedLoopJoin") ||
           p.contains("BroadcastExchange"),
      "the 1-row totals must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k tail must not global-sort")
  }

  test("g02 wedges and closings meet through equi-joins, never nested loops") {
    // degree-ordered triangle counting lives or dies on the wedge join
    // being a hash/merge equi-join on the apex (the kd inequality is a
    // post-filter) and the closing join an equi-join on (x, y)
    val p = graft.operators.Graph.g02Plan(spark, sfDir)._1
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"triangle joins degraded to a nested loop:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k tail must not global-sort")
  }

  test("x17 pruned scan pushes the shipdate window into the picked files") {
    // after the manifest cut, the exact predicate must STILL reach the
    // reader as pushed filters — file pruning composes with row-group
    // pruning, it does not replace it
    val p = formatted("x17_manifest_pruned_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate lower bound must be pushed, got:\n$p")
    assert(p.contains("LessThan(l_shipdate"),
      s"shipdate upper bound must be pushed, got:\n$p")
  }

  test("SQL-route graft_dot reads float arrays in place (cast stripped)") {
    // the round-7 advisor's asymmetry: the SQL builder wraps unresolved
    // args in cast(array<float> → array<double>), which would
    // materialize a fresh double array per row — StripDotCast must
    // remove it so spark.sql callers pay the DataFrame route's
    // zero-copy cost, with bit-identical results (float widening is
    // exact per element)
    GraftFunctions.register(spark)
    val df = spark.sql(
      s"SELECT vec_id, graft_dot(embedding, embedding) AS d " +
        s"FROM parquet.`$sfDir/embeddings.parquet`")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("dotproductd") || opt.toLowerCase.contains("dot"),
      s"expected the dot expression in:\n$opt")
    assert(!opt.toLowerCase.contains("cast(embedding"),
      s"the float-array cast survived optimization:\n$opt")
    // equality with the DataFrame route on a sample row
    import org.apache.spark.sql.functions.col
    val sqlRow = df.where(col("vec_id") === 0).collect().head.getDouble(1)
    val dfRow = graft.Tables.load(spark, sfDir, "embeddings")
      .where(col("vec_id") === 0)
      .select(graft.functions.VectorFunctions.dot(
        col("embedding"), col("embedding")).as("d"))
      .collect().head.getDouble(0)
    assert(sqlRow == dfRow)
  }

  test("m04 frame fan-out runs narrow — Generate with zero exchanges") {
    // the frame table is a per-payload explode: any exchange here
    // would mean payload bytes moving between tasks
    val p = formatted("m04_multimodal_frame_table")
    assert(p.contains("Generate"))
    assert(!p.contains("Exchange"),
      s"m04 must not shuffle payloads:\n$p")
  }
}
