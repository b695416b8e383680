package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts of CHECK constraints: violating mutations abort before
  * any manifest exists (table untouched, staging cleaned), SQL NULL
  * semantics (NULL passes, only strict FALSE violates), per-write
  * schema scoping, and drop. */
class CheckConstraintSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k", k * 10)).toDF("k", "v", "amt")

  test("a violating append aborts atomically; the staging is cleaned") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-check-abort"), "k", rows(1, 2, 3))
    // round 15: addCheck is a VERSIONED metadata commit (a `prop`
    // fingerprint row claims v2), so racing writers see the change
    t.addCheck("amt_nonneg", "amt >= 0")
    assert(t.head == 2, "a constraint change claims a version slot")
    val bad = Seq((4L, "s4", -1L)).toDF("k", "v", "amt")
    val ex = intercept[IllegalArgumentException] { t.append(bad) }
    assert(ex.getMessage.contains("amt_nonneg"),
      "the error must name the constraint")
    assert(t.head == 2, "no DATA version may commit")
    assert(t.read().count() == 3)
    // the aborted stage left nothing behind: no stray markers, and the
    // only data dir is v1's
    val leftover = new java.io.File(s"${t.root}/data").listFiles()
    assert(!leftover.exists(_.getName.startsWith(".staging-")),
      "the aborted stage's marker must clear")
    assert(leftover.count(_.isDirectory) == 1,
      "the aborted stage's files must delete")
    // a valid append still lands, and a violating MERGE aborts too
    assert(t.append(Seq((4L, "s4", 40L)).toDF("k", "v", "amt")) == 3)
    intercept[IllegalArgumentException] {
      t.merge(Seq((2L, "U2", -5L)).toDF("k", "v", "amt"))
    }
    assert(t.head == 3 && t.read().count() == 4)
  }

  test("SQL CHECK semantics: NULL passes, only strict FALSE violates") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-check-null"), "k", rows(1))
    t.addCheck("v_prefixed", "v LIKE 's%'") // v2: the metadata commit
    // a NULL v evaluates the predicate to NULL — SQL says that PASSES
    assert(t.append(Seq((2L, null.asInstanceOf[String], 20L))
      .toDF("k", "v", "amt")) == 3)
    intercept[IllegalArgumentException] {
      t.append(Seq((3L, "x3", 30L)).toDF("k", "v", "amt"))
    }
  }

  test("constraints scope to the staged schema; drop re-opens the gate") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-check-scope"), "k", rows(1, 2))
    t.addCheck("amt_cap", "amt <= 100") // v2: the metadata commit
    // a pre-evolution feed without `amt` cannot express the
    // constraint — it skips, exactly like Delta's per-write scoping
    assert(t.append(Seq((9L, "s9")).toDF("k", "v")) == 3)
    intercept[IllegalArgumentException] {
      t.append(Seq((5L, "s5", 500L)).toDF("k", "v", "amt"))
    }
    t.dropCheck("amt_cap") // v4: the drop is versioned too
    assert(t.append(Seq((5L, "s5", 500L)).toDF("k", "v", "amt")) == 5)
    assert(t.checks().isEmpty)
    // a no-op drop neither rewrites the conf nor claims a version
    val h = t.head
    t.dropCheck("never_existed")
    assert(t.head == h)
  }

  test("addCheck rejects bad syntax/names eagerly, not mid-ingest") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-check-syntax"), "k", rows(1))
    intercept[Exception] { t.addCheck("broken", "amt >=") }
    intercept[IllegalArgumentException] { t.addCheck("bad name", "amt >= 0") }
    assert(t.checks().isEmpty, "a rejected constraint must not persist")
    // re-adding a name replaces, listing reflects it
    t.addCheck("c1", "amt >= 0")
    t.addCheck("c1", "amt >= 10")
    assert(t.checks() == Map("c1" -> "amt >= 10"))
  }
}
