package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.PredicateTree
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-file NULL COUNTS (Iceberg's null_value_counts) and the
  * IS [NOT] NULL pruning they enable: a data-cleaning delete of NULL
  * rows opens only files that HAVE nulls, proven by hiding the rest. */
class NullStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 100 rows over 4 key-range files; `note` is NULL only in the k
    * 51-75 file — the other three files carry exact zero null counts */
  private def fixture(prefix: String): GraftTable =
    GraftTable.create(spark, graft.util.Scratch.dir(prefix), "k",
      spark.range(1, 101).toDF("k")
        .withColumn("note",
          when(col("k") > 50 && col("k") <= 75, lit(null))
            .otherwise(concat(lit("n"), col("k"))))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))

  test("IS NULL parses and prunes off the manifest null counts") {
    assert(PredicateTree.parse(col("c").isNull) ==
      PredicateTree.NullTest("c", isNull = true))
    assert(PredicateTree.parse(col("c").isNotNull) ==
      PredicateTree.NullTest("c", isNull = false))
    val t = fixture("graft-nulls-prune")
    val refs = t.manifestOf(1)
    val data = refs.filter(_.kind == "data")
    assert(data.forall(_.nstats.contains("note")),
      "every staged file must record the column's null count")
    val candNull = t.pruneByPredicate(data, col("note").isNull)
    assert(candNull.size == 1, s"only the null-bearing file: $candNull")
    // the data-cleaning delete opens ONLY that file: hide the others
    import java.nio.file.{Files, Paths}
    val others = data.map(_.file).filterNot(candNull.contains)
    others.foreach(f => Files.move(Paths.get(f), Paths.get(f + ".h")))
    try assert(t.delete(col("note").isNull) == 2)
    finally others.foreach(f =>
      Files.move(Paths.get(f + ".h"), Paths.get(f)))
    assert(t.read().count() == 75)
    assert(t.read().where(col("note").isNull).count() == 0)
  }

  test("IS NOT NULL prunes the all-NULL file; NOT composes soundly") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-nulls-allnull"), "k",
      spark.range(1, 41).toDF("k")
        .withColumn("note",
          when(col("k") <= 20, lit(null)).otherwise(lit("x")))
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    val data = t.manifestOf(1).filter(_.kind == "data")
    assert(t.pruneByPredicate(data, col("note").isNotNull).size == 1)
    // NOT(IS NULL) must agree with IS NOT NULL's pruning direction
    assert(t.pruneByPredicate(data, !col("note").isNull).size == 1)
    assert(t.readWhere(col("note").isNotNull).count() == 20)
    assert(t.readWhere(!col("note").isNull).count() == 20)
  }

  test("legacy manifests without null counts stay unpruned, never wrong") {
    val t = fixture("graft-nulls-legacy")
    val data = t.manifestOf(1).filter(_.kind == "data")
    val stripped = data.map(_.copy(nstats = Map.empty))
    assert(t.pruneByPredicate(stripped, col("note").isNull).size == 4,
      "no counts ⇒ every file stays a candidate")
  }
}
