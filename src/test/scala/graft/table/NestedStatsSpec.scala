package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Struct-nested per-file stats (round 18): integral/string leaves
  * under STRUCT columns record dotted-path (min, max) / null-count
  * bounds in the manifest (the parquet footers carry them for free),
  * and predicates over `s.field` prune files exactly like top-level
  * columns — proven by hiding non-candidates through a read and a
  * delete. Also pins the path-resolution contract behind it: a
  * struct path must NEVER alias a same-named TOP-LEVEL column's
  * stats (the wrong-prune hazard the full-path parse closes), and a
  * qualifier-prefixed reference still resolves to its column. */
class NestedStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** 100 rows over 4 key-range files; meta.score = k*10 (integral
    * leaf), meta.tag = "m" + zero-padded k (string leaf) */
  private def fixture(prefix: String): GraftTable =
    GraftTable.create(spark, graft.util.Scratch.dir(prefix), "k",
      spark.range(1, 101).toDF("k")
        .withColumn("meta", struct(
          (col("k") * 10).as("score"),
          concat(lit("m"),
            lpad(col("k").cast("string"), 3, "0")).as("tag")))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))

  test("struct-leaf bounds land in the manifest under dotted paths") {
    val t = fixture("graft-nested-stats")
    val data = t.manifestOf(1).filter(_.kind == "data")
    assert(data.forall(_.stats.contains("meta.score")),
      "integral struct leaves must record (min, max)")
    assert(data.forall(_.sstats.contains("meta.tag")),
      "string struct leaves must record lexicographic bounds")
    assert(data.forall(_.nstats.contains("meta.score")),
      "struct leaves must record exact null counts")
    // meta.score = k*10 over 4 k-range files: > 900 is the last file
    val cand = t.pruneByPredicate(data, col("meta.score") > 900)
    assert(cand.size == 1, s"integral leaf must prune: $cand")
    // the string leaf prunes lexicographically: < m026 is file 1
    val candS = t.pruneByPredicate(data, col("meta.tag") < "m026")
    assert(candS.size == 1, s"string leaf must prune: $candS")
  }

  test("nested predicates prune reads and deletes: hidden files prove it") {
    val t = fixture("graft-nested-prune")
    val data = t.manifestOf(1).filter(_.kind == "data")
    val cand = t.pruneByPredicate(data, col("meta.score") >= 910)
    assert(cand.size == 1, s"$cand")
    import java.nio.file.{Files, Paths}
    val others = data.map(_.file).filterNot(cand.contains)
    others.foreach(f => Files.move(Paths.get(f), Paths.get(f + ".h")))
    try {
      assert(t.readWhere(col("meta.score") >= 910).count() == 10,
        "the pruned read must open only the candidate file")
      assert(t.delete(col("meta.score") >= 910) == 2,
        "the pruned delete (v2) must open only the candidate file")
    } finally others.foreach(f =>
      Files.move(Paths.get(f + ".h"), Paths.get(f)))
    assert(t.read().count() == 90)
    assert(t.read().where(col("meta.score") >= 910).count() == 0)
  }

  test("case-mismatched struct references resolve like the row filter") {
    // the SESSION resolver (case-insensitive by default) anchors and
    // canonicalizes the path — a case-mismatched head must not be
    // misread as a qualifier (which would drop it and prune against
    // the wrong column), and the tail must still find the bounds
    val t = fixture("graft-nested-case")
    val data = t.manifestOf(1).filter(_.kind == "data")
    assert(t.pruneByPredicate(data, col("META.Score") > 900).size == 1)
    assert(t.readWhere(col("META.Score") > 900).count() == 10)
  }

  test("colliding footer keys record no stats, never a summed null count") {
    // a top-level column literally named "a.b" and struct leaf a.b
    // share one parquet footer key: bounds would union (sound) but
    // null counts would SUM — an IS NOT NULL delete planned off the
    // inflated count would prune files whose rows are live. Both
    // leaves are excluded from stats instead.
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-nested-collide"), "k",
      spark.range(1, 21).toDF("k")
        .withColumn("a.b",
          when(col("k") <= 10, lit(null)).otherwise(col("k")))
        .withColumn("a", struct(
          when(col("k") > 10, lit(null)).otherwise(col("k")).as("b"))))
    val data = t.manifestOf(1).filter(_.kind == "data")
    assert(data.forall(r =>
        !r.stats.contains("a.b") && !r.nstats.contains("a.b")),
      "the shared footer key must record nothing")
    // both columns hold live rows — nothing may prune
    assert(t.readWhere(col("`a.b`").isNotNull).count() == 10)
  }

  test("a struct path never aliases a same-named top-level column") {
    // BOTH a top-level `score` (1..40) and `meta.score` (+1000): the
    // pre-round-18 leaf-name collapse would evaluate meta.score
    // predicates against top-level score's bounds and prune files
    // that DO match — silent row loss on a delete
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-nested-shadow"), "k",
      spark.range(1, 41).toDF("k")
        .withColumn("score", col("k"))
        .withColumn("meta", struct((col("k") + 1000).as("score")))
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    val data = t.manifestOf(1).filter(_.kind == "data")
    // every row satisfies meta.score > 1000: NOTHING may prune
    assert(t.pruneByPredicate(data, col("meta.score") > 1000).size == 2,
      "struct-path bounds, not the top-level column's, must answer")
    // and the dotted path still prunes off its OWN bounds
    assert(t.pruneByPredicate(data, col("meta.score") > 1020).size == 1)
    // a qualifier prefix resolves to the column it qualifies: score
    // <= 0 is false everywhere, so everything prunes
    assert(t.pruneByPredicate(data,
      col("q.score") <= 0).isEmpty,
      "a non-column head part is a qualifier and must drop")
  }
}
