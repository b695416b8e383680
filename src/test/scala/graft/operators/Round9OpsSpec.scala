package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Round-9 contracts: fixture preconditions the as-of oracles lean on,
  * plus the pins for this round's new operators. */
class Round9OpsSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  test("purchase (user_id, ts) pairs are unique — the as-of tie-break is vacuous at fixture SFs") {
    // x05's DuckDB-native ASOF oracle has NO tie-break for duplicate
    // right-side (user_id, ts) pairs while the engine formulations pick
    // the greatest purchase_id deterministically (round-8 advisor).
    // x21 now carries its own explicit-tie-break oracle; x05 keeps the
    // cross-engine-native oracle on the strength of THIS precondition —
    // if a future fixture violates it, this spec fails before the
    // verify gate can flap nondeterministically.
    val dups = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).count()
      .where(col("count") > 1)
    assert(dups.isEmpty, "duplicate purchase (user_id, ts) pairs would " +
      "make x05's DuckDB ASOF oracle nondeterministic")
  }

  test("x23 MERGE is copy-on-write: only range-matched files rewrite, the rest carry verbatim") {
    val (v1, matched, v2) = ScaleOps.x23Plan(spark, sfDir)
    // the value hash can't see the file lists — pin the COW contract:
    // the update keys are localized to the low quarter of the key
    // space, so MERGE must rewrite a strict, non-empty subset of files
    assert(matched.nonEmpty, "merge must match at least one file")
    assert(matched.size < v1.size,
      s"range targeting failed: all ${v1.size} files rewritten")
    assert(matched.forall(v1.contains))
    val untouched = v1.diff(matched)
    assert(untouched.forall(v2.contains),
      "untouched base files must carry into the merged snapshot verbatim")
    assert(matched.forall(f => !v2.contains(f)),
      "rewritten files must leave the merged snapshot")
  }

  test("x23 time travel: the pre-merge snapshot still reads the old values") {
    val (v1, _, v2) = ScaleOps.x23Plan(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val mx = orders.agg(max(col("o_orderkey"))).head.getLong(0)
    // an updated key: 0 is %37-divisible and ≤ mx/4 at every SF
    def statusOf(fs: Seq[String], key: Long): Seq[String] =
      spark.read.parquet(fs: _*).where(col("o_orderkey") === key)
        .select(col("o_orderstatus")).collect().map(_.getString(0)).toSeq
    val original = orders.where(col("o_orderkey") === 0)
      .select(col("o_orderstatus")).head.getString(0)
    assert(statusOf(v1, 0L) == Seq(original),
      "v1 must read the pre-merge status after the merge commits")
    assert(statusOf(v2, 0L) == Seq("U"),
      "v2 must read the merged status")
    // inserts land beyond the old max key: in v2 only
    assert(statusOf(v1, mx + 1) == Seq.empty)
    assert(statusOf(v2, mx + 1) == Seq("N"))
    // row accounting: v2 = base + inserts (no deletes in this delta)
    val inserts = orders.where(col("o_orderkey") % 97 === 0).count()
    assert(spark.read.parquet(v1: _*).count() == orders.count())
    assert(spark.read.parquet(v2: _*).count() == orders.count() + inserts)
  }

  test("x25 DELETE is copy-on-write: range-pruned rewrite, deleted rows gone only from v2") {
    val (v1, matched, v2) = ScaleOps.x25Plan(spark, sfDir)
    // the delete predicate is localized to the low quarter of the key
    // space — planning off the manifest must rewrite a strict subset
    assert(matched.nonEmpty && matched.size < v1.size)
    assert(v1.diff(matched).forall(v2.contains))
    assert(matched.forall(f => !v2.contains(f)))
    def has(fs: Seq[String], key: Long): Boolean =
      spark.read.parquet(fs: _*)
        .where(col("o_orderkey") === key).limit(1).count() == 1
    val mx = Tables.orders(spark, sfDir)
      .agg(max(col("o_orderkey"))).head.getLong(0)
    // key 0 qualifies (0 % 53 = 0, <= mx/4): deleted from v2, kept in v1
    assert(has(v1, 0L) && !has(v2, 0L))
    // key 1 is in a REWRITTEN file but doesn't qualify: must survive
    assert(has(v1, 1L) && has(v2, 1L))
    // a %53 key beyond the range cut doesn't qualify: must survive
    val beyond = (mx / 4 / 53 + 1) * 53
    assert(beyond <= mx && has(v2, beyond))
    // row accounting: v2 = base − matched deletes
    val orders = Tables.orders(spark, sfDir)
    val deletes = orders
      .where(col("o_orderkey") <= mx / 4 && col("o_orderkey") % 53 === 0)
      .count()
    assert(deletes > 0)
    assert(spark.read.parquet(v2: _*).count() == orders.count() - deletes)
  }

  test("x26 vacuum deletes exactly the unreferenced files, retained snapshot intact") {
    val (v3, vacuumed) = ScaleOps.x26Stage(spark, sfDir)
    // something actually expired, and it was the delta fragments
    assert(vacuumed.nonEmpty)
    assert(vacuumed.forall(_.contains("/delta/")))
    // physically gone — storage was reclaimed, not just dereferenced
    vacuumed.foreach(f =>
      assert(!new java.io.File(f).exists(), s"vacuumed file survived: $f"))
    // every retained file survives, and structurally no live file can
    // be vacuumed: deletion was computed as (all physical) − (live)
    v3.foreach(f =>
      assert(new java.io.File(f).exists(), s"live file vacuumed: $f"))
    assert(vacuumed.toSet.intersect(v3.toSet).isEmpty)
    // retention never changes what live readers see
    val li = Tables.lineitem(spark, sfDir)
    assert(spark.read.parquet(v3: _*).count() == li.count())
  }

  test("w18 commits are exactly-once: a replayed batch is a no-op, versions stay readable") {
    val root = graft.util.Scratch.dir("graft-w18-spec")
    val orders = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    val b0 = orders.where(col("o_orderkey") < 100)
    val b1 = orders.where(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
    StreamingOps.w18Commit(root, b0, 0L)
    StreamingOps.w18Commit(root, b1, 1L)
    val mpath = s"$root/manifest"
    val before = spark.read.parquet(mpath).collect().map(_.toSeq).toSet
    // replay batch 1 — the failure window between a sink commit and
    // the checkpoint write, which Spark answers by re-delivering the
    // batch; the commit protocol must detect and skip it
    StreamingOps.w18Commit(root, b1, 1L)
    val after = spark.read.parquet(mpath).collect().map(_.toSeq).toSet
    assert(after == before, "a replayed committed batch must be a no-op")
    // every intermediate version stays time-travel-readable
    def files(v: Long): Seq[String] =
      spark.read.parquet(mpath).where(col("version") === v)
        .select(col("file")).collect().map(_.getString(0)).toSeq
    assert(spark.read.parquet(files(0): _*).count() == b0.count())
    assert(spark.read.parquet(files(1): _*).count() == b0.count() + b1.count())
  }

  test("x27 schema evolution never rewrites old files; v1 reads keep the old schema") {
    val (v1, v2) = ScaleOps.x27Stage(spark, sfDir)
    // the evolution commit only ADDED files
    assert(v1.forall(v2.contains) && v2.size > v1.size)
    // pre-evolution files are byte-identical after the commit (no
    // rewrite happened — the O(metadata) promise)
    import java.nio.file.{Files, Paths}
    val sizes = v1.map(f => Files.size(Paths.get(f)))
    val (_, v2Again) = ScaleOps.x27Stage(spark, sfDir)
    assert(v1.map(f => Files.size(Paths.get(f))) == sizes)
    assert(v2Again == v2)
    // a v1-only read still serves the OLD schema untouched
    val v1Schema = spark.read.parquet(v1: _*).schema.fieldNames.toSet
    assert(v1Schema == Set("o_orderkey", "o_price"))
    // the unified read carries the new column, NULL before the boundary
    val unified = spark.read.option("mergeSchema", "true").parquet(v2: _*)
    assert(unified.schema.fieldNames.contains("o_channel"))
    val cut = Tables.orders(spark, sfDir)
      .agg(max(col("o_orderkey"))).head.getLong(0) / 2
    assert(unified.where(col("o_orderkey") <= cut &&
      col("o_channel").isNotNull).isEmpty)
    assert(unified.where(col("o_orderkey") > cut &&
      col("o_channel").isNull).isEmpty)
  }

  test("x28 optimistic commits: one winner per slot, loser retries on the new head") {
    val root = graft.util.Scratch.dir("graft-x28-spec")
    new java.io.File(s"$root/commits").mkdirs()
    import spark.implicits._
    def files(sub: String, rows: Seq[Long]): Seq[String] = {
      rows.toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$root/$sub")
      new java.io.File(s"$root/$sub").listFiles.toSeq.map(_.getName)
        .filter(_.startsWith("part-")).sorted.map(n => s"$root/$sub/$n")
    }
    val base = files("base", Seq(1L, 2L))
    val dA = files("dA", Seq(3L))
    val dB = files("dB", Seq(4L))
    assert(ScaleOps.x28Commit(spark, root, 0, base))
    // both writers read head 1; A publishes v2 first
    assert(ScaleOps.x28Commit(spark, root, 1, dA))
    val v2Files = spark.read.parquet(s"$root/commits/v2")
      .collect().map(_.getString(0)).toSet
    // B's stale attempt must FAIL and must not touch A's slot
    assert(!ScaleOps.x28Commit(spark, root, 1, dB),
      "a stale commit must lose the rename race")
    assert(spark.read.parquet(s"$root/commits/v2")
      .collect().map(_.getString(0)).toSet == v2Files,
      "the losing writer must not disturb the winner's slot")
    // B retries against the refreshed head and lands on the NEXT slot
    assert(ScaleOps.x28Head(root) == 2)
    assert(ScaleOps.x28Commit(spark, root, 2, dB))
    assert(ScaleOps.x28Head(root) == 3)
    // the final version carries base ∪ dA ∪ dB, nothing lost or doubled
    val finalFiles = spark.read.parquet(s"$root/commits/v3")
      .collect().map(_.getString(0)).toSeq
    val ks = spark.read.parquet(finalFiles: _*)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == Seq(1L, 2L, 3L, 4L))
  }

  test("x28 under a REAL race: 8 concurrent writers all land, nothing lost or doubled") {
    val root = graft.util.Scratch.dir("graft-x28-race")
    new java.io.File(s"$root/commits").mkdirs()
    import spark.implicits._
    def files(sub: String, rows: Seq[Long]): Seq[String] = {
      rows.toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$root/$sub")
      new java.io.File(s"$root/$sub").listFiles.toSeq.map(_.getName)
        .filter(_.startsWith("part-")).sorted.map(n => s"$root/$sub/$n")
    }
    assert(ScaleOps.x28Commit(spark, root, 0, files("base", Seq(0L))))
    val writers = (1 to 8).map(i => i.toLong -> files(s"w$i", Seq(i.toLong)))
    // every writer stages once, then loops read-head → commit until its
    // rename wins — the protocol's liveness under genuine contention
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = writers.map { case (_, fs) =>
      Future {
        var done = false
        while (!done)
          done = ScaleOps.x28Commit(spark, root, ScaleOps.x28Head(root), fs)
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    // 8 writers + the base = head version 9, and the final manifest
    // carries every writer's row exactly once
    assert(ScaleOps.x28Head(root) == 9)
    val finalFiles = spark.read.parquet(s"$root/commits/v9")
      .collect().map(_.getString(0)).toSeq
    val ks = spark.read.parquet(finalFiles: _*)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (0L to 8L))
  }

  test("x29 deletion vectors: zero files rewritten, merge-on-read ≡ copy-on-write") {
    // byte-identity of the base before/after the DV commit: the whole
    // point of merge-on-read is that data files are never touched
    val (_, v1, _) = ScaleOps.x23Stage(spark, sfDir)
    import java.nio.file.{Files, Path, Paths}
    // the staged manifest carries input_file_name() URIs ("file:/…")
    def toPath(f: String): Path =
      if (f.startsWith("file:")) Paths.get(java.net.URI.create(f))
      else Paths.get(f)
    val sizesBefore = v1.map(f => Files.size(toPath(f)))
    val (_, applied, dvRows) = ScaleOps.x29Parts(spark, sfDir)
    assert(v1.map(f => Files.size(toPath(f))) == sizesBefore)
    // DV cardinality = exactly the matched rows
    val orders = Tables.orders(spark, sfDir)
    val mx = orders.agg(max(col("o_orderkey"))).head.getLong(0)
    val expected = orders
      .where(col("o_orderkey") <= mx / 4 && col("o_orderkey") % 53 === 0)
      .count()
    assert(dvRows == expected && dvRows > 0)
    // cross-mechanism equivalence: the DV-applied read equals x25's
    // copy-on-write v2 read row-for-row — what a COW→MoR format
    // migration relies on
    val (_, _, cowV2) = ScaleOps.x25Plan(spark, sfDir)
    val cow = spark.read.parquet(cowV2: _*)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_price"))
      .collect().map(_.toSeq).toSet
    assert(applied.collect().map(_.toSeq).toSet == cow)
  }

  test("g01 iterations reuse the standing cached partitionings") {
    // round-8 verdict: edges were cached PRE-shuffle, so every
    // iteration re-exchanged both sides of the rank join. With the
    // standing hash(a)/hash(node) caches, the lazy 5-iteration plan
    // carries at most 7 one-time shuffles (edges groupBy + standing
    // repartition and their re-appearance under the dependent outW /
    // nodes cache builds) plus exactly ONE shuffle per iteration (the
    // b→node contribution flip, which no partitioning can avoid);
    // small sides ride broadcasts. A regression to per-iteration
    // re-exchanging shows up as ≥2 shuffles per round and fails this.
    val (plan, caches) = Graph.g01Plan(spark, sfDir)
    try {
      val p = plan.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val shuffles = "\\(\\d+\\) Exchange\\b".r.findAllIn(p).length
      assert(shuffles <= 12,
        s"expected ≤12 shuffles (7 one-time + 1/iteration), got $shuffles")
    } finally caches.foreach(_.unpersist())
  }

  test("w17 drained stream equals batch x21 (slicing-insensitive by construction)") {
    // an as-of match depends only on the left row and the static
    // dimension, so any micro-batch slicing of the error stream yields
    // the same enriched union — the drained 3-batch replay must equal
    // the batch operator row-for-row
    val streamed = graft.SparkEntry
      .queries("w17_stream_asof_enrich")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.SparkEntry
      .queries("x21_native_asof_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
