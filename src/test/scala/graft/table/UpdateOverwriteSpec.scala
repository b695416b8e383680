package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts of UPDATE and OVERWRITE WHERE the gated x54/x55 hashes
  * cannot see: only matched files rewrite, right-hand sides evaluate
  * against the OLD row, NULL-predicate rows survive unchanged, the
  * replaceWhere constraint aborts atomically, and renamed (x53)
  * columns flow through both verbs. */
class UpdateOverwriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Seq[Long]) =
    ks.map(k => (k, k * 10, k * 100)).toDF("k", "a", "b")

  test("UPDATE rewrites only matched files; RHS sees the OLD row") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-upd-partial"), "k",
      rows(1L to 40L).repartitionByRange(4, col("k"))
        .sortWithinPartitions("k"))
    val v1 = t.filesOf(1)
    // SET a = b, b = a must SWAP (both RHS read the pre-update row)
    t.update(col("k") === 7,
      Map("a" -> col("b"), "b" -> col("a")))
    val v2 = t.filesOf(2)
    assert(v1.intersect(v2).size == v1.size - 1,
      "only the file holding k=7 may rewrite")
    val r = t.read().where(col("k") === 7).head
    assert(r.getLong(1) == 700L && r.getLong(2) == 70L,
      s"swap semantics: got (a=${r.getLong(1)}, b=${r.getLong(2)})")
    // unmatched rows byte-carry; counts unchanged
    assert(t.count() == 40)
    assert(t.read().where(col("k") === 8).head.getLong(1) == 80L)
  }

  test("UPDATE: NULL-evaluating predicate rows survive; guards hold") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-upd-null"), "k",
      Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
        .toDF("k", "v"))
    // v > 10 is NULL for k=2 — SQL UPDATE leaves it alone
    t.update(col("v") > 10, Map("v" -> lit(999L)))
    val got = t.read().collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 5L, 2L -> -1L, 3L -> 999L))
    intercept[IllegalArgumentException] {
      t.update(col("k") === 1, Map("k" -> lit(9L))) // the key
    }
    intercept[IllegalArgumentException] {
      t.update(col("k") === 1, Map("nope" -> lit(9L))) // unknown column
    }
    intercept[IllegalArgumentException] {
      t.update(col("k") === 1, Map.empty) // no assignments
    }
  }

  test("UPDATE casts the RHS to the column's type; never retypes it") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-upd-types"), "k",
      rows(1L to 5L))
    // a STRING literal on a LONG column: without the cast, `when`
    // would coerce the whole column to string in the staged files
    t.update(col("k") === 2, Map("a" -> lit("77")))
    assert(t.read().schema("a").dataType ==
      org.apache.spark.sql.types.LongType,
      "the column's type must survive the update")
    assert(t.read().where(col("k") === 2).head.getLong(1) == 77L)
    // an UNCASTABLE value fails loudly (ANSI), never silently retypes
    intercept[Exception] {
      t.update(col("k") === 3, Map("a" -> lit("not a number")))
    }
    assert(t.read().where(col("k") === 3).head.getLong(1) == 30L,
      "the failed update must leave the table untouched")
    // ...and no staging orphans either: the failed WRITE cleans its
    // marker + partial dir like a checks violation does
    val leftover = new java.io.File(s"${t.root}/data").listFiles()
    assert(!leftover.exists(_.getName.startsWith(".staging-")),
      "a failed stage write must clear its marker")
  }

  test("UPDATE flows through a renamed column (x53 interaction)") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-upd-renamed"), "k",
      rows(1L to 10L))
    t.renameColumn("a", "amount") // v2
    val t2 = GraftTable.open(spark, t.root, "k")
    t2.update(col("amount") === 30L, Map("amount" -> lit(-3L))) // v3
    assert(t2.read().where(col("k") === 3).head.getLong(1) == -3L)
    assert(t2.read().columns.toSeq == Seq("k", "amount", "b"))
    // time travel below the update AND the rename still serves v1
    assert(t2.read(1).where(col("k") === 3).head.getLong(1) == 30L)
  }

  test("OVERWRITE WHERE is one atomic commit; outside files carry") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-ow-atomic"), "k",
      rows(1L to 40L).repartitionByRange(4, col("k"))
        .sortWithinPartitions("k"))
    val v1 = t.filesOf(1)
    // backfill keys <= 10 with a recomputed slice that DROPS odd keys
    val repl = rows((2L to 10L by 2).toSeq)
      .select(col("k"), (col("a") + 1).as("a"), col("b"))
    val v = t.overwriteWhere(col("k") <= 10, repl)
    assert(v == 2, "delete + insert must be ONE commit")
    val keys = t.read().select(col("k")).collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == ((2L to 10L by 2) ++ (11L to 40L)).sorted,
      "window rows replaced (odd keys dropped), outside rows untouched")
    assert(t.read().where(col("k") === 4).head.getLong(1) == 41L)
    assert(t.filesOf(2).intersect(v1).nonEmpty,
      "files outside the window must carry by reference")
  }

  test("the change feed nets an OVERWRITE WHERE correctly (CDC through backfill)") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-ow-cdc"), "k",
      rows(1L to 10L).repartitionByRange(2, col("k"))
        .sortWithinPartitions("k"))
    // replace keys <= 4: evens get a += 1, odds DROP
    t.overwriteWhere(col("k") <= 4,
      rows(Seq(2L, 4L)).select(col("k"), (col("a") + 1).as("a"), col("b")))
    val ch = t.changes(1, 2).select(col("k"), col("change_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ch == Map(1L -> "delete", 3L -> "delete",
      2L -> "update", 4L -> "update"),
      s"a downstream mirror must net the backfill exactly: $ch")
  }

  test("OVERWRITE WHERE rejects replacement rows outside the window") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-ow-guard"), "k", rows(1L to 20L))
    val bad = rows(Seq(5L, 15L)) // 15 > 10: outside the window
    val e = intercept[IllegalArgumentException] {
      t.overwriteWhere(col("k") <= 10, bad)
    }
    assert(e.getMessage.contains("do not satisfy"))
    assert(t.head == 1 && t.count() == 20, "the table must be untouched")
    val leftover = new java.io.File(s"${t.root}/data").listFiles()
    assert(!leftover.exists(_.getName.startsWith(".staging-")),
      "nothing may stage before the constraint check")
  }
}
