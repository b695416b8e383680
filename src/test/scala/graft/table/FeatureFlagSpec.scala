package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** READER FEATURE FLAGS (Delta's protocol/table-features): the verbs
  * that make a table depend on a reader capability stamp a
  * `kind = "feature"` row, and every snapshot resolution validates the
  * flags (and the row-kind closed world) before serving — an older
  * binary fails LOUDLY with the feature's name instead of silently
  * mis-projecting. Pins the stamping verbs, flag carry through full
  * rewrites and clones, version-scoped enforcement (time travel below
  * the introduction still reads), and both unsupported-flag and
  * unknown-kind failures via forged commit slots. */
class FeatureFlagSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(ks: Long*) = ks.map(k => (k, s"s$k")).toDF("k", "v")

  private def flagsOf(t: GraftTable, v: Long): Set[String] =
    t.manifestOf(v).collect {
      case r if r.kind == "feature" => r.file.stripPrefix("feature:") }.toSet

  test("evolution verbs stamp their flags; full rewrites and clones carry them") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-feature-stamp"), "k",
      rows(1L to 6L: _*))                                    // v1
    assert(flagsOf(t, 1).isEmpty, "a plain table needs no features")
    t.renameColumn("v", "label")                             // v2
    assert(flagsOf(t, 2) == Set("colmap"))
    t.addColumn("tier", org.apache.spark.sql.types.StringType,
      Some("'std'"))                                         // v3
    assert(flagsOf(t, 3) == Set("colmap", "addcol"))
    t.renameColumn("label", "tag") // idempotent stamp       // v4
    assert(t.manifestOf(4).count(_.kind == "feature") == 2)
    // a full rewrite (cluster) describes the same table: flags carry
    t.cluster(Seq("k"), targetFiles = 2)                     // v5
    assert(flagsOf(t, 5) == Set("colmap", "addcol"))
    val clone = GraftTable.shallowClone(spark, t.root, "k",
      graft.util.Scratch.dir("graft-feature-clone"))
    assert(flagsOf(clone, 1) == Set("colmap", "addcol"),
      "clones inherit the source's reader requirements")
    // restore below the introduction drops the requirement
    t.restore(1)                                             // v6
    assert(flagsOf(t, t.head).isEmpty)
  }

  /** append a forged row to the head commit slot (simulating a newer
    * writer) and return a FRESH handle (per-handle memos) */
  private def forge(t: GraftTable, kind: String, file: String): GraftTable = {
    val slot = s"${t.root}/commits/v${t.head}"
    val df = spark.read.parquet(slot)
    val forgedRow = df.limit(1)
      .withColumn("file", lit(file)).withColumn("kind", lit(kind))
    val all = df.union(forgedRow).collect()
    val tmp = s"${t.root}/commits/.forge-tmp"
    spark.createDataFrame(
      spark.sparkContext.parallelize(all.toSeq, 1), df.schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf()).getRawFileSystem
    fs.delete(new org.apache.hadoop.fs.Path(slot), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(slot))
    GraftTable.open(spark, t.root, "k")
  }

  test("an unsupported feature flag fails the read loudly; older versions still read") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-feature-unsupported"), "k",
      rows(1, 2))                                            // v1
    t.append(rows(3))                                        // v2
    val t2 = forge(t, "feature", "feature:vector-index")
    val e = intercept[IllegalStateException] { t2.read().collect() }
    assert(e.getMessage.contains("vector-index") &&
      e.getMessage.contains("upgrade"),
      s"want the feature name and the remedy, got: ${e.getMessage}")
    assert(t2.read(1).count() == 2,
      "time travel below the feature's introduction must still read")
  }

  test("an unknown row kind fails the same way (closed-world manifests)") {
    val t = GraftTable.create(spark,
      graft.util.Scratch.dir("graft-feature-unknownkind"), "k",
      rows(1, 2))                                            // v1
    val t2 = forge(t, "rowtracking", "rowtracking:enabled")
    val e = intercept[IllegalStateException] { t2.read().collect() }
    assert(e.getMessage.contains("rowtracking") &&
      e.getMessage.contains("upgrade"))
  }
}
