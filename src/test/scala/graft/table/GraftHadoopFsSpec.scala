package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The round-12 distributed-filesystem contract: every physical
  * operation of GraftTable — listing, markers, sizes, vacuum deletes —
  * rides `org.apache.hadoop.fs` ([[TableIO]]), so a table root given
  * as a URI (here `file:`, in production `hdfs://nn/...`) works end to
  * end. The commit CAS routes PER SCHEME like Delta's LogStores:
  * local roots (both forms this spec drives) publish via java.nio
  * rename(2) — the Hadoop local connector's rename falls back to
  * moving the source INTO an existing destination, which this spec's
  * race caught losing 1-2 of 6 concurrent commits before the routing —
  * while hdfs:// publishes via `FileContext.rename(Options.Rename
  * .NONE)`, NameNode-serialized. The S3 caveat — object stores have no
  * atomic rename at all — is documented on TableIO, not papered
  * over. */
class GraftHadoopFsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k")).toDF("k", "v")
  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq

  /** a scratch root addressed THROUGH the Hadoop URI form */
  private def uriRoot(prefix: String): String =
    "file:" + graft.util.Scratch.dir(prefix)

  test("full lifecycle on a file: URI root (Hadoop FS listing/marker/vacuum)") {
    val t = GraftTable.create(spark, uriRoot("graft-hfs-life"), "k",
      rows(1L to 20L: _*).repartitionByRange(4, col("k"))
        .sortWithinPartitions("k"))
    assert(t.head == 1)
    t.append(rows(21L, 22L))
    t.merge(Seq((2L, "U2"), (30L, "NEW")).toDF("k", "v"))
    t.delete(col("k") === 5)
    t.delete(col("k") === 7, mode = "mor")
    t.compact(targetFiles = 2)
    val expect = ((1L to 22L) ++ Seq(30L)).filterNot(k => k == 5 || k == 7)
    assert(keys(t.read()) == expect)
    assert(t.read().where(col("k") === 2).head.getString(1) == "U2")
    // time travel, history, CDC all work over the URI root
    assert(keys(t.read(1)) == (1L to 20L))
    assert(t.history().count() == t.head)
    val c = t.changes(1, 3)
    assert(c.where(col("change_type") === "insert").count() == 3) // 21,22,30
    // restore + expire: the vacuum walks the Hadoop listing
    val before = t.head
    t.restore(1)
    assert(t.head == before + 1)
    assert(keys(t.read()) == (1L to 20L))
    val gone = t.expire(keepLast = 1)
    assert(gone.nonEmpty, "superseded files must vacuum on the URI root")
    assert(keys(t.read()) == (1L to 20L))
  }

  test("6 concurrent appenders on a file: URI root: the DFS CAS holds") {
    val t = GraftTable.create(spark, uriRoot("graft-hfs-race"), "k", rows(0))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 6).map(i => Future { t.append(rows(i.toLong)) })
    Await.result(Future.sequence(fs), 120.seconds)
    assert(t.head == 7, "every writer must win exactly one version slot")
    assert(keys(t.read()) == (0L to 6L))
  }

  test("stats pruning and txn guards are path-scheme-independent") {
    val t = GraftTable.create(spark, uriRoot("graft-hfs-prune"), "k",
      rows(1L to 100L: _*).repartitionByRange(5, col("k"))
        .sortWithinPartitions("k"))
    val data = t.manifestOf(1).filter(_.kind == "data")
    assert(data.size >= 4)
    // manifests record canonical (scheme-less) local paths, so the
    // provenance join and the stats range join line up
    assert(data.forall(r => !r.file.startsWith("file:")))
    assert(t.pruneByKeys(data, Seq((3L, "u")).toDF("k", "v")).size < data.size)
    // txn-guarded replay through the URI root
    assert(t.streamAppend(rows(101L), 9L) == 2)
    assert(t.streamAppend(rows(101L), 9L) == 2, "replay must no-op")
  }
}
