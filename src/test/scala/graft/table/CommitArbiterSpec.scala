package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The object-store commit protocol (round-13 verdict #3): on a store
  * whose rename silently overwrites (s3a's copy+delete), the rename
  * CAS is not a CAS at all — so tables there publish single-object
  * manifests via atomic create-if-absent instead
  * ([[CommitArbiter.ConditionalPut]]). This spec (1) demonstrates the
  * hazard on the fake store, (2) races 6 concurrent writers through
  * the conditional-put protocol and proves no commit is lost, and
  * (3) checks every metadata reader handles file-shaped slots. */
class CommitArbiterSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    // register the fake scheme once, on the context's conf — every
    // newHadoopConf() (TableIO's included) inherits it
    s.sparkContext.hadoopConfiguration
      .set("fs.fakeobj.impl", classOf[FakeObjectStoreFs].getName)
    s
  }
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k")).toDF("k", "v")
  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq

  private def fakeRoot(prefix: String): String =
    "fakeobj://" + graft.util.Scratch.dir(prefix)

  test("the fake store's rename is not a CAS — both racers 'win' the slot") {
    val dir = fakeRoot("graft-arb-hazard")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/a")); fs.create(new Path(s"$dir/a/x")).close()
    fs.mkdirs(new Path(s"$dir/b")); fs.create(new Path(s"$dir/b/y")).close()
    // both exist; a usable commit CAS must FAIL this rename — the
    // store instead "succeeds" by nesting the source inside the
    // target (the s3a / Hadoop-local emulation), so a second writer
    // racing a slot also sees true and its manifest lands as garbage
    assert(fs.rename(new Path(s"$dir/a"), new Path(s"$dir/b")),
      "object-store rename reports success onto an existing target")
    assert(fs.exists(new Path(s"$dir/b/a/x")),
      "...by nesting the loser's content inside the winner's slot")
    // the conditional put, by contrast, refuses the taken slot
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    assert(io.createExclusive(s"$dir/slot", "first".getBytes))
    assert(!io.createExclusive(s"$dir/slot", "second".getBytes))
    assert(new String(io.readBytes(s"$dir/slot")) == "first")
  }

  test("6 concurrent writers through conditional-put: every commit lands") {
    val root = fakeRoot("graft-arb-race")
    val t = GraftTable.open(spark, root, "k")
    t.setCommitArbiter("cput")
    t.append(rows(0))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 6).map(i =>
      Future { GraftTable.open(spark, root, "k").append(rows(i.toLong)) })
    Await.result(Future.sequence(fs), 180.seconds)
    assert(t.head == 7, "every writer must win exactly one version slot")
    assert(keys(t.read()) == (0L to 6L), "no commit may be lost")
    // each slot is ONE object, and each version reads back complete
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    (1L to 7L).foreach { v =>
      assert(io.exists(s"$root/commits/v$v"))
      assert(t.filesOf(v).nonEmpty)
    }
  }

  test("file-shaped slots ride every metadata path (history/count/travel/expire)") {
    val root = fakeRoot("graft-arb-life")
    val t = GraftTable.open(spark, root, "k")
    t.setCommitArbiter("cput")
    t.append(rows(1L to 20L: _*))
    t.merge(Seq((2L, "U2"), (30L, "NEW")).toDF("k", "v"))
    t.delete(col("k") === 5)
    assert(keys(t.read()) ==
      ((1L to 20L).filterNot(_ == 5) :+ 30L).sorted)
    assert(t.read().where(col("k") === 2).head.getString(1) == "U2")
    assert(keys(t.read(1)) == (1L to 20L), "time travel over file slots")
    assert(t.history().count() == 3)
    assert(t.count() == 20)
    assert(t.changes(1, 2).where(col("change_type") === "insert")
      .count() == 1)
    // txn guards persist through single-object manifests
    assert(t.streamAppend(rows(100L), 5L) == 4)
    assert(t.streamAppend(rows(100L), 5L) == 4, "replay must no-op")
    // vacuum with file-shaped commit slots
    t.restore(1)
    val gone = t.expire(keepLast = 1)
    assert(gone.nonEmpty && keys(t.read()) == (1L to 20L))
    intercept[IllegalArgumentException] { t.setCommitArbiter("zookeeper") }
  }

  test("cput refuses a store that doesn't advertise conditional create") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.dumbobj.impl", classOf[NonAdvertisingStoreFs].getName)
    val root = "dumbobj://" + graft.util.Scratch.dir("graft-arb-noadv")
    val t = GraftTable.open(spark, root, "k")
    val e = intercept[IllegalArgumentException] { t.setCommitArbiter("cput") }
    assert(e.getMessage.contains("conditional-create"),
      s"the refusal must name the missing primitive: ${e.getMessage}")
    assert(e.getMessage.contains("commit.conf"),
      "...and the manual opt-in escape hatch")
    // the capable fake store and local/hdfs-style roots still pass
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    assert(io.supportsConditionalCreate(
      fakeRoot("graft-arb-cap") + "/commits"))
    assert(io.supportsConditionalCreate(
      graft.util.Scratch.dir("graft-arb-cap-local")))
  }

  test("a mid-write failure on a visible-create store never fakes a lost race") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornwrite.impl", classOf[TornWriteStoreFs].getName)
    val root = "tornwrite://" + graft.util.Scratch.dir("graft-arb-torn")
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    val slot = s"$root/commits/v1"
    io.mkdirs(s"$root/commits")
    // the claim succeeds (path visible), the byte stream dies — the
    // old conflated catch saw "target exists" and returned false
    // ("another writer won"), leaving 4 torn bytes as the slot every
    // reader and retry would then fold
    val e = intercept[java.io.IOException] {
      io.createExclusive(slot, Array.fill[Byte](1024)(7))
    }
    assert(e.getMessage.contains("simulated mid-write failure"))
    assert(!io.exists(slot),
      "the partial slot object must be removed, not reported as a win")
  }

  test("a close failure after a fully-landed write is OUR win, not a lost race") {
    // round-14 verdict's own-complete-slot case: bytes all durable,
    // close() throws. The old handler saw a complete object and
    // conceded "the other writer's win" → a txn-less plain append
    // would retry against its own committed manifest and land its
    // rows TWICE. The fixed handler compares the slot's bytes to ours
    // and reports the win — commit acknowledged exactly once.
    spark.sparkContext.hadoopConfiguration
      .set("fs.closefail.impl", classOf[CloseFailStoreFs].getName)
    val root = "closefail://" + graft.util.Scratch.dir("graft-arb-closefail")
    val t = GraftTable.open(spark, root, "k")
    t.setCommitArbiter("cput")
    t.append(rows(1, 2, 3)) // EVERY cput publish hits the failing close
    t.append(rows(4))
    assert(t.head == 2, "each append must claim exactly one slot")
    assert(keys(t.read()) == Seq(1L, 2L, 3L, 4L),
      "rows must commit exactly once — a conceded win duplicates them")
    assert(t.read().count() == 4)
  }

  test("an UNREADABLE slot under correlated throttling is never deleted") {
    // round-15 advisor (high): the winner's COMMITTED manifest sits at
    // the slot; our PUT fails with a generic IOException and the
    // completeness probe's GET fails too (throttling hits both). The
    // old probe swallowed its read failure as "torn" and DELETED the
    // winner's acknowledged commit. Now: rethrow, slot untouched.
    spark.sparkContext.hadoopConfiguration
      .set("fs.throttled.impl", classOf[ThrottledStoreFs].getName)
    val root = "throttled://" + graft.util.Scratch.dir("graft-arb-throttle")
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    io.mkdirs(s"$root/commits")
    val slot = s"$root/commits/v1"
    val winner = "PAR1-winner-manifest-PAR1".getBytes
    io.writeUtf8(slot, new String(winner)) // overwrite=true path works
    ThrottledStoreFs.failReads.set(true)
    try {
      val e = intercept[java.io.IOException] {
        io.createExclusive(slot, "PAR1-our-manifest-bytes-PAR1".getBytes)
      }
      assert(e.getMessage.contains("simulated PUT throttle"))
      assert(e.getSuppressed.exists(
        _.getMessage.contains("simulated GET throttle")),
        "the probe's own failure must ride along, not be swallowed")
    } finally ThrottledStoreFs.failReads.set(false)
    assert(io.exists(slot), "the winner's committed slot must survive")
    assert(io.readBytes(slot).sameElements(winner),
      "...byte-for-byte — deleting it loses an acknowledged commit")
  }

  test("a create-time failure that left our empty object visible cleans up") {
    // round-15 advisor (low): visible-create store, create() throws
    // AFTER the path became visible as an empty object. The old
    // `if (exists) return false` reported our own abandoned partial as
    // another writer's slot; now it is deleted and the failure surfaces.
    spark.sparkContext.hadoopConfiguration
      .set("fs.createfail.impl", classOf[CreateFailStoreFs].getName)
    val root = "createfail://" + graft.util.Scratch.dir("graft-arb-createfail")
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    io.mkdirs(s"$root/commits")
    val slot = s"$root/commits/v1"
    val e = intercept[java.io.IOException] {
      io.createExclusive(slot, "PAR1-manifest-PAR1".getBytes)
    }
    assert(e.getMessage.contains("simulated create failure"))
    assert(!io.exists(slot),
      "our empty partial must not stand as a slot readers would fold")
  }

  test("a table may switch publish protocols mid-life (local root)") {
    // cput is correct on ANY store (create-if-absent is atomic locally
    // via O_EXCL); rename is the default. Readers never care which
    // protocol minted a slot: v1 = directory, v2 = file, v3 = directory.
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-arb-switch"), "k", rows(1, 2))
    t.setCommitArbiter("cput")
    val t2 = GraftTable.open(spark, t.root, "k")
    t2.append(rows(3))
    t2.setCommitArbiter("rename")
    val t3 = GraftTable.open(spark, t.root, "k")
    t3.append(rows(4))
    assert(t3.head == 3 && keys(t3.read()) == Seq(1L, 2L, 3L, 4L))
    assert(t3.history().count() == 3)
    val io = new TableIO(spark.sparkContext.hadoopConfiguration)
    assert(!io.list(s"${t.root}/commits").find(_.getPath.getName == "v2")
      .exists(_.isDirectory), "the cput slot is a single object")
    assert(io.list(s"${t.root}/commits").find(_.getPath.getName == "v3")
      .exists(_.isDirectory), "the rename slot is a directory")
  }
}
