package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The DELTA-ENCODED manifest log (round 13): a full-manifest-per-
  * commit log makes every append's metadata cost grow with the TABLE
  * (O(files) manifest rows rewritten per commit — at 10⁵-10⁶ files,
  * megabytes of parquet per one-file append), the write-side twin of
  * the round-12 read-path schema sweep. Steady-state commits now
  * write O(change) slots — adds, `rm` rows, the complete txn
  * checkpoint set, and a `delta` marker — with a FULL checkpoint slot
  * every [[GraftTable.MaxManifestChain]] commits (and whenever the
  * delta wouldn't beat half the full manifest), exactly Delta's
  * JSON-actions-plus-checkpoint shape folded into the slot files.
  * Readers fold back at most MaxManifestChain slots; legacy tables
  * (every slot full, no markers) read unchanged. */
class DeltaManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k")).toDF("k", "v")
  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq

  /** physical rows of a version SLOT (not the folded manifest) */
  private def slotRows(root: String, v: Long) =
    spark.read.parquet(s"$root/commits/v$v").collect().toSeq

  test("appends write O(change) slots; checkpoints land on cadence") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-cadence"), "k", rows(0).coalesce(1))
    (1L to 12L).foreach(k => t.append(rows(k).coalesce(1)))
    assert(t.head == 13)
    // steady-state slot = 1 added ref + 1 txn checkpoint marker + 1
    // delta marker — O(change), regardless of how many files the
    // snapshot holds (v5's snapshot has 5; a full slot would hold 6)
    val v5 = slotRows(t.root, 5)
    assert(v5.size == 3, s"delta slot must be O(change), got:\n$v5")
    assert(v5.count(_.getString(1) == "data") == 1)
    assert(v5.count(_.getString(1) == "delta") == 1)
    // the chain depth is bounded: v1 full; v2 full by the size
    // heuristic (a 1-ref delta is not smaller than half of 2); v3-v10
    // deepen to MaxManifestChain; v11 is the forced cadence
    // checkpoint; v12+ restart the chain
    assert(t.manifestSnap(1).depth == 0)
    assert(t.manifestSnap(2).depth == 0)
    assert(t.manifestSnap(10).depth == GraftTable.MaxManifestChain)
    assert(t.manifestSnap(11).depth == 0, "cadence checkpoint at v11")
    assert(slotRows(t.root, 11).count(_.getString(1) == "data") == 11,
      "the checkpoint slot carries the whole snapshot")
    assert(t.manifestSnap(13).depth == 2)
    // folds serve the exact snapshots: head, time travel, counts
    assert(t.filesOf(13).size == 13)
    assert(keys(t.read()) == (0L to 12L))
    assert(keys(t.read(7)) == (0L to 6L), "time travel folds mid-chain")
    assert(t.count() == 13 && t.count(7) == 7)
    // history reports SNAPSHOT totals per version, not slot contents
    val hist = t.history().orderBy("version").collect()
    assert(hist.map(_.getInt(1)).toSeq == (1 to 13),
      "history must fold per-version file counts")
    assert(hist.map(_.getAs[Long]("n_rows")).toSeq ==
      (1L to 13L), "history must fold per-version row totals")
  }

  test("a localized merge's slot holds rm + adds, never the carried refs") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-merge"), "k",
      rows(1L to 200L: _*).repartitionByRange(10, col("k"))
        .sortWithinPartitions("k"))
    val v1Files = t.filesOf(1)
    assert(v1Files.size == 10)
    // rewrite only the file holding keys 181..200
    t.merge((196L to 200L).map(k => (k, s"U$k")).toDF("k", "v"))
    val slot = slotRows(t.root, 2)
    val adds = slot.filter(_.getString(1) == "data").map(_.getString(0))
    val rms = slot.filter(_.getString(1) == "rm").map(_.getString(0))
    assert(rms.size == 1, s"one file rewrites -> one rm, got:\n$slot")
    assert(v1Files.contains(rms.head), "rm names the rewritten v1 file")
    assert(adds.nonEmpty && adds.forall(!v1Files.contains(_)),
      "slot data rows are the REWRITE's files only")
    // the 9 untouched files ride by reference, never re-listed
    assert(slot.count(r => v1Files.contains(r.getString(0)) &&
      r.getString(1) == "data") == 0,
      "carried refs must NOT rewrite into the slot")
    assert(t.filesOf(2).count(v1Files.contains) == 9, "9 carried by ref")
    assert(t.filesOf(2).size == 9 + adds.size)
    assert(t.read().where(col("k") === 197).head.getString(1) == "U197")
    assert(keys(t.read()) == (1L to 200L))
  }

  test("readers need only the checkpoint suffix: hidden-prefix table serves") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-suffix"), "k", rows(0).coalesce(1))
    (1L to 12L).foreach(k => t.streamAppend(rows(k).coalesce(1), k))
    assert(t.manifestSnap(11).depth == 0, "cadence checkpoint at v11")
    // hide every slot BELOW the checkpoint: a cold handle must plan
    // reads, replay guards, commits, and the change feed from the
    // checkpoint suffix alone — the fold walk is chain-bounded, never
    // O(versions)
    val hidden = (1L to 10L).map(v =>
      new java.io.File(s"${t.root}/commits/v$v"))
    hidden.foreach(d => assert(d.renameTo(
      new java.io.File(d.getParent, d.getName + ".hidden"))))
    try {
      val cold = GraftTable.open(spark, t.root, "k")
      assert(keys(cold.read()) == (0L to 12L))
      assert(cold.count() == 13)
      assert(cold.streamAppend(rows(9), 12L) == 13, "replay no-ops")
      assert(cold.streamAppend(rows(100L).coalesce(1), 99L) == 14,
        "a new commit composes off the checkpoint suffix")
      assert(keys(cold.changes(11, 13)) == Seq(11L, 12L))
      assert(cold.merge(Seq((0L, "U0")).toDF("k", "v")) == 15)
      assert(cold.read().where(col("k") === 0).head.getString(1) == "U0")
    } finally hidden.foreach(d => new java.io.File(
      d.getParent, d.getName + ".hidden").renameTo(d))
    assert(keys(t.read()) == ((0L to 12L) :+ 100L))
  }

  test("expire GC's the log prefix behind the checkpoint anchor") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-logttl"), "k", rows(0).coalesce(1))
    (1L to 12L).foreach(k => t.append(rows(k).coalesce(1)))
    assert(t.manifestSnap(11).depth == 0 && t.manifestSnap(12).depth == 1)
    def slotExists(v: Long) =
      new java.io.File(s"${t.root}/commits/v$v").exists
    // dryRun and a young-slot age floor both leave the log intact
    t.expire(keepLast = 2, dryRun = true)
    assert((1L to 13L).forall(slotExists))
    t.expire(keepLast = 2, minAgeMs = 3600L * 1000)
    assert((1L to 13L).forall(slotExists))
    // the real sweep: cutoff v12 folds from the v11 checkpoint, so
    // slots v1-v10 serve no retained version and GC
    t.expire(keepLast = 2)
    assert((1L to 10L).forall(v => !slotExists(v)), "prefix GC'd")
    assert((11L to 13L).forall(slotExists), "checkpoint suffix retained")
    assert(t.oldestVersion == 11)
    // a COLD handle: reads, history, timestamp travel, restore all
    // start at the oldest retained version
    val cold = GraftTable.open(spark, t.root, "k")
    assert(keys(cold.read()) == (0L to 12L))
    assert(keys(cold.read(11)) == (0L to 10L))
    val hist = cold.history().orderBy("version").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L))
    assert(cold.versionAt(cold.commitTimestampOf(13)) == 13)
    intercept[IllegalArgumentException] {
      cold.versionAt(cold.commitTimestampOf(11) - 1)
    }
    intercept[IllegalArgumentException] { cold.restore(5) }
    intercept[IllegalArgumentException] { cold.changes(5, 13) }
    intercept[IllegalArgumentException] { cold.read(5) }
    assert(cold.restore(12) == 14)
    assert(keys(cold.read()) == (0L to 11L))
    // a second sweep on the already-GC'd log is a clean no-op shape
    cold.expire(keepLast = 2)
    assert(cold.oldestVersion >= 11 && keys(cold.read()) == (0L to 11L))
  }

  test("every version the GC'd log still serves stays EXECUTABLE (anchor retention)") {
    // versions that REWRITE files are the dangerous shape (round-14
    // advisor): the log GC keeps the cutoff's whole fold chain
    // [anchor, cutoff), but the old data sweep retained only
    // [cutoff, head]'s files — so a version the loud expired-from-log
    // guard still admits could scan into a vacuumed file. Twelve
    // single-file merges give head=13 with checkpoint v10 and chain
    // v11-v13: after expire(keepLast=1), v10-v12 survive the log GC
    // and must read COMPLETELY, including the pre-rewrite files only
    // they reference.
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-anchor"), "k",
      rows(0L to 5L: _*).repartitionByRange(6, col("k"))
        .sortWithinPartitions("k"))
    (1L to 12L).foreach(i =>
      t.merge(Seq((i % 6, s"u$i")).toDF("k", "v")))
    assert(t.head == 13)
    assert(t.manifestSnap(10).depth == 0, "checkpoint at v10")
    assert(t.manifestSnap(13).depth == 3)
    def values(v: Long): Map[Long, String] =
      t.read(v).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = (10L to 13L).map(v => v -> values(v)).toMap
    val gone = t.expire(keepLast = 1)
    assert(gone.nonEmpty, "pre-anchor rewrite fossils must vacuum")
    assert(t.oldestVersion == 10)
    val cold = GraftTable.open(spark, t.root, "k")
    (10L to 13L).foreach { v =>
      val got = cold.read(v).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == before(v),
        s"version $v survived the log GC but lost data files")
    }
    intercept[IllegalArgumentException] { cold.read(9) }
  }

  test("a long ascending fold walk stays bounded (LRU memo) and exact") {
    // 36 appends outgrow the 32-entry snapshot memo: history() and the
    // spot reads below force evictions mid-walk; correctness must not
    // depend on every fold staying resident
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-dm-lru"), "k", rows(0).coalesce(1))
    (1L to 35L).foreach(k => t.append(rows(k).coalesce(1)))
    assert(t.head == 36)
    val cold = GraftTable.open(spark, t.root, "k")
    val hist = cold.history().orderBy("version").collect()
    assert(hist.length == 36)
    assert(hist.map(_.getLong(0)).toSeq == (1L to 36L))
    // n_rows off the folded counters, every version exact
    assert(hist.map(_.getAs[Long]("n_rows")).toSeq == (1L to 36L))
    // random-order travel across evicted folds
    Seq(36L, 3L, 20L, 9L, 33L, 1L).foreach { v =>
      assert(keys(cold.read(v)) == (0L until v), s"version $v")
    }
  }

  test("the whole mutation surface folds: lifecycle snapshots replay exactly") {
    val t = GraftTable.open(spark,
      graft.util.Scratch.dir("graft-dm-life"), "k")
    t.setCommitArbiter("cput") // delta slots as single objects, too
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def step(mutate: => Unit): Unit = { mutate; snapshots += keys(t.read()) }
    step(t.append(rows(1L to 20L: _*)
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")))
    step(t.append(rows(21L, 22L)))
    step(t.merge(Seq((2L, "U2"), (30L, "NEW")).toDF("k", "v")))
    step(t.delete(col("k") === 5, mode = "mor"))
    step(t.delete(col("k") === 6))
    step(t.compact(targetFiles = 2, smallFileBytes = Long.MaxValue))
    step(t.restore(2))
    step(t.merge(Seq((7L, "U7")).toDF("k", "v")))
    // a COLD handle replays every version from the log alone
    val cold = GraftTable.open(spark, t.root, "k")
    snapshots.zipWithIndex.foreach { case (want, i) =>
      assert(keys(cold.read(i + 1L)) == want, s"version ${i + 1} folds")
      assert(cold.count(i + 1L) == want.size)
    }
    assert(cold.read().where(col("k") === 7).head.getString(1) == "U7")
    assert(cold.history().count() == snapshots.size)
    // compact and restore rewrote most refs — those commits checkpoint
    // (full slots), so chains stay short and deltas stay small
    assert(cold.manifestSnap(6).depth == 0, "compact writes a checkpoint")
    assert(cold.manifestSnap(7).depth == 0, "restore writes a checkpoint")
  }
}
