package graft.table

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing table-format API — the x17-x29 mechanisms composed
  * into one handle a pipeline actually programs against:
  *
  * {{{
  * val t = GraftTable.create(spark, root, keyCol = "id", df)
  * t.append(more)                  // new files + a new version
  * t.merge(delta)                  // COW upsert by key
  * t.delete(col("id") % 53 === 0)  // COW delete
  * t.compact()                     // fold small files, same rows
  * t.expire(keepLast = 1)          // vacuum unreferenced files
  * t.read()                        // head snapshot
  * t.read(version = 2)            // time travel
  * }}}
  *
  * Storage model (the x18/x28 layout): immutable data files under
  * `root/data/<uuid>/part-*`, one manifest parquet per version under
  * `root/commits/v{N}` listing the version's exact file set. Every
  * commit is PREPARED at a temp name and PUBLISHED by an atomic rename
  * onto the next version slot — optimistic concurrency (x28): exactly
  * one writer wins a slot; every mutator here runs a read-head →
  * compose → rename CAS loop, so concurrent writers all land without
  * locks (GraftTableSpec races 6 appenders to prove it).
  *
  * Mutation planning is containment-exact: a MERGE/DELETE first scans
  * the CURRENT snapshot for the files that actually hold matched rows
  * (`_metadata.file_path` — at 100 TB this scan is itself pruned by
  * the format's stats, x17's half of the story) and rewrites ONLY
  * those; untouched files carry between versions by reference. Readers
  * of any retained version are never blocked by a mutation, and
  * `expire` deletes exactly (all physical) − (union of retained
  * manifests) — x26's structural safety.
  */
final class GraftTable private (spark: SparkSession, val root: String,
                                keyCol: String) {
  import spark.implicits._

  private val commitsDir = s"$root/commits"
  private val dataDir = s"$root/data"

  /** current head version (0 = no commit yet) */
  def head: Long = {
    val d = new java.io.File(commitsDir)
    if (!d.exists) 0L
    else d.listFiles.toSeq.map(_.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      .foldLeft(0L)(math.max)
  }

  /** the exact file set version `v` committed */
  def filesOf(v: Long): Seq[String] =
    spark.read.parquet(s"$commitsDir/v$v")
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

  /** snapshot read — head by default, any retained version by number */
  def read(version: Long = -1L): DataFrame = {
    val v = if (version < 0) head else version
    val fs = filesOf(v)
    if (fs.isEmpty) spark.emptyDataFrame else spark.read.parquet(fs: _*)
  }

  // ---- write path -----------------------------------------------------

  /** land `df` as immutable files under a fresh uuid dir; returns them */
  private def stage(df: DataFrame): Seq[String] = {
    val sub = s"$dataDir/${java.util.UUID.randomUUID()}"
    df.write.parquet(sub)
    new java.io.File(sub).listFiles.toSeq.map(_.getName)
      .filter(_.startsWith("part-")).sorted.map(n => s"$sub/$n")
  }

  /** one CAS attempt: prepare the manifest at a temp name, publish by
    * atomic rename onto v{expected+1}; false = another writer won */
  private def tryCommit(expected: Long, files: Seq[String]): Boolean = {
    val tmp = s"$commitsDir/.tmp-${java.util.UUID.randomUUID()}"
    files.toDF("file").coalesce(1).write.parquet(tmp)
    try {
      Files.move(Paths.get(tmp), Paths.get(s"$commitsDir/v${expected + 1}"),
        StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.io.IOException =>
        graft.util.Scratch.deleteTree(Paths.get(tmp)); false
    }
  }

  /** the CAS loop every mutator runs: re-reads the head and re-composes
    * its METADATA on conflict — staged data files are never re-written */
  private def commitLoop(compose: Seq[String] => Seq[String]): Long = {
    var committed = false
    var v = 0L
    while (!committed) {
      val h = head
      val base = if (h == 0) Seq.empty[String] else filesOf(h)
      v = h + 1
      committed = tryCommit(h, compose(base))
    }
    v
  }

  /** append-only commit: new files, every existing file by reference */
  def append(df: DataFrame): Long = {
    val fs = stage(df)
    commitLoop(base => base ++ fs)
  }

  /** the current snapshot with the provenance column the mutation
    * planners target files by */
  private def withFile(fs: Seq[String]): DataFrame =
    spark.read.parquet(fs: _*)
      // _metadata.file_path is a URI; manifests hold plain paths
      .withColumn("__file",
        regexp_replace(col("_metadata.file_path"), "^file:(//)?", ""))

  /** COW upsert by key: files holding a delta key rewrite with the
    * delta's rows taking precedence; delta keys in no file insert */
  def merge(delta: DataFrame): Long = commitLoop { base =>
    val cur = withFile(base)
    val matched = cur
      .join(broadcast(delta.select(col(keyCol))), Seq(keyCol))
      .select(col("__file")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val touched =
      if (matched.isEmpty) read(head).limit(0)
      else spark.read.parquet(matched: _*)
    // kept ∪ delta IS the upsert: delta rows replace matched keys and
    // supply the inserts (a delta key absent from every matched file is
    // absent from the table — containment-exact targeting)
    val kept = touched.join(broadcast(delta.select(col(keyCol))),
      Seq(keyCol), "left_anti")
    val fs = stage(kept.unionByName(delta))
    base.diff(matched) ++ fs
  }

  /** COW delete: files holding a matching row rewrite with the
    * predicate negated */
  def delete(predicate: Column): Long = commitLoop { base =>
    val matched = withFile(base).where(predicate)
      .select(col("__file")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (matched.isEmpty) base
    else base.diff(matched) ++
      stage(spark.read.parquet(matched: _*).where(!predicate))
  }

  /** rewrite the whole snapshot into ~targetFiles right-sized files —
    * contents identical (x19's contract), commit swaps the file set */
  def compact(targetFiles: Int = 1): Long = commitLoop { base =>
    stage(spark.read.parquet(base: _*).coalesce(math.max(1, targetFiles)))
  }

  /** expire everything but the last `keepLast` versions and VACUUM:
    * physically delete exactly (all physical) − (retained manifests'
    * union) — structurally never a file a retained version reads.
    * Returns the deleted files. */
  def expire(keepLast: Int): Seq[String] = {
    val h = head
    val retained = (math.max(1, h - keepLast + 1) to h)
      .flatMap(filesOf).toSet
    val all = {
      val d = new java.io.File(dataDir)
      if (!d.exists) Seq.empty[String]
      else d.listFiles.toSeq.flatMap(sub =>
        sub.listFiles.toSeq.filter(_.getName.startsWith("part-")))
        .map(_.getPath)
    }
    val vacuumed = all.filterNot(retained).sorted
    vacuumed.foreach(f => Files.deleteIfExists(Paths.get(f)))
    vacuumed
  }
}

object GraftTable {
  /** version 1 = the initial file set */
  def create(spark: SparkSession, root: String, keyCol: String,
             df: DataFrame): GraftTable = {
    new java.io.File(s"$root/commits").mkdirs()
    val t = new GraftTable(spark, root, keyCol)
    require(t.head == 0, s"table at $root already exists")
    t.append(df)
    t
  }

  /** open an existing table */
  def open(spark: SparkSession, root: String, keyCol: String): GraftTable =
    new GraftTable(spark, root, keyCol)
}
