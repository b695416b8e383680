package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts of the public table API that x30's value hash cannot see:
  * version numbering, time travel across mutations, partial-rewrite
  * file diffs, vacuum safety, and commit liveness under a real
  * multi-writer race. */
class GraftTableSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k")).toDF("k", "v")
  private def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq

  test("lifecycle: every mutation is one version; time travel crosses all of them") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-tbl-spec"), "k", rows(1, 2, 3))
    assert(t.head == 1)
    t.append(rows(4, 5))
    assert(t.head == 2)
    t.merge(Seq((2L, "UPDATED"), (6L, "INSERTED")).toDF("k", "v"))
    assert(t.head == 3)
    t.delete(col("k") === 1)
    assert(t.head == 4)
    t.compact()
    assert(t.head == 5)
    // head: 1 deleted, 2 updated, 6 inserted
    assert(keys(t.read()) == Seq(2L, 3L, 4L, 5L, 6L))
    assert(t.read().where(col("k") === 2).head.getString(1) == "UPDATED")
    // time travel: every intermediate state is still exactly readable
    assert(keys(t.read(1)) == Seq(1L, 2L, 3L))
    assert(keys(t.read(2)) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(t.read(2).where(col("k") === 2).head.getString(1) == "s2")
    assert(keys(t.read(3)) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(keys(t.read(4)) == Seq(2L, 3L, 4L, 5L, 6L))
  }

  test("merge and delete rewrite only the files that hold matched rows") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-tbl-spec"), "k",
      rows(1L to 20L: _*).repartition(4, col("k")))
    val v1 = t.filesOf(1)
    t.merge(Seq((7L, "U")).toDF("k", "v"))
    val v2 = t.filesOf(2)
    // exactly the file(s) holding key 7 left; the rest carried by reference
    assert(v1.intersect(v2).nonEmpty, "untouched files must carry")
    assert(v1.diff(v2).nonEmpty && v1.diff(v2).size < v1.size,
      "only matched files may rewrite")
    t.delete(col("k") === 13)
    val v3 = t.filesOf(3)
    assert(v2.intersect(v3).nonEmpty && v2.diff(v3).size < v2.size)
    assert(keys(t.read()) == ((1L to 20L).filterNot(_ == 13L)))
  }

  test("compaction shrinks the file count without changing a row") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-tbl-spec"), "k",
      rows(1L to 12L: _*).repartition(6))
    val before = t.read().collect().map(_.toSeq).toSet
    t.compact(targetFiles = 1)
    assert(t.filesOf(t.head).size < t.filesOf(1).size)
    assert(t.read().collect().map(_.toSeq).toSet == before)
  }

  test("expire vacuums only unreferenced files; the head read is untouched") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-tbl-spec"), "k", rows(1, 2, 3))
    t.delete(col("k") === 2) // v2 rewrites everything (single file table)
    val headBefore = t.read().collect().map(_.toSeq).toSet
    val vacuumed = t.expire(keepLast = 1)
    assert(vacuumed.nonEmpty, "v1's superseded files must vacuum")
    vacuumed.foreach(f => assert(!new java.io.File(f).exists))
    t.filesOf(t.head).foreach(f => assert(new java.io.File(f).exists))
    assert(t.read().collect().map(_.toSeq).toSet == headBefore)
  }

  test("6 concurrent appenders all land: no lost updates, no duplicates") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-tbl-spec"), "k", rows(0))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 6).map(i => Future { t.append(rows(i.toLong)) })
    Await.result(Future.sequence(fs), 120.seconds)
    assert(t.head == 7, "every writer must win exactly one version")
    assert(keys(t.read()) == (0L to 6L))
  }
}
