// dev probe, declared in graft.table for access to the private[table]
// race seams (beforePublishHook, stageCounter) it instruments
package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the COST MODEL of commitLoopMutate's conflict-aware
  * retries at table width (the 100 TB stand-in variable is FILE
  * COUNT — the rebase check is manifest-scale set algebra, so its
  * cost must track the manifest, not the data). Builds an
  * nFiles-file table, then measures:
  *
  *  1. an uncontended merge (compose + stage + publish baseline);
  *  2. the same merge losing its slot race to `nLosses` interleaved
  *     DISJOINT appends — the loser must re-point metadata-only
  *     (stage() once), so the overhead per lost race ≈ one manifest
  *     fold + footprint set algebra + one re-publish;
  *  3. the merge losing to an OVERLAPPING append — the full
  *     re-compose (stage() twice), the price of a real conflict.
  *
  * Usage: runMain graft.table.ConflictRebaseProbe [nFiles] [nLosses]
  */
object ConflictRebaseProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1024)
    val nLosses = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mx = nFiles.toLong * 50
    def freshTable(tag: String): (GraftTable, GraftTable) = {
      val root = graft.util.Scratch.dir(s"graft-rebase-probe-$tag")
      val base = spark.range(mx)
        .select(col("id").as("k"), (col("id") % 97).as("x"))
      val t = GraftTable.create(spark, root, "k",
        base.repartitionByRange(nFiles, col("k")).sortWithinPartitions("k"))
      (t, GraftTable.open(spark, root, "k"))
    }
    def delta = Seq((5L, -1L), (mx / 2, -2L)).toDF("k", "x")
    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // warm the whole merge path on a throwaway table first — the cold
    // first merge otherwise pays plan codegen and inverts the
    // quiet-vs-contended comparison (the ScaleProbe warmth effect)
    val (tw, ow) = freshTable("warm")
    ow.append(Seq((mx + 1, 0L)).toDF("k", "x").coalesce(1))
    tw.merge(delta)

    // 1) uncontended baseline
    val (t1, _) = freshTable("quiet")
    t1.stageCounter.set(0)
    val (quietSec, _) = time(t1.merge(delta))
    println(f"REBASEPROBE files=$nFiles quiet-merge   ${quietSec}%6.2f s stages=${t1.stageCounter.get}")

    // 2) nLosses disjoint interleaved appends: metadata-only rebases
    val (t2, o2) = freshTable("disjoint")
    var fires = 0
    var interleaveSec = 0.0
    t2.beforePublishHook = () =>
      if (fires < nLosses) {
        fires += 1
        val (s, _) = time(
          o2.append(Seq((mx + 100 + fires, 0L)).toDF("k", "x").coalesce(1)))
        interleaveSec += s
      }
    t2.stageCounter.set(0)
    val (lossSec, _) = time(t2.merge(delta))
    t2.beforePublishHook = () => ()
    val overhead = lossSec - interleaveSec - quietSec
    println(f"REBASEPROBE files=$nFiles $nLosses-disjoint  ${lossSec}%6.2f s " +
      f"(interleaved appends ${interleaveSec}%5.2f s) stages=${t2.stageCounter.get} " +
      f"rebase-overhead ${overhead}%5.2f s (${overhead / nLosses}%5.3f s/loss)")

    // 3) one OVERLAPPING loss: the full re-compose for contrast
    val (t3, o3) = freshTable("overlap")
    var fired = false
    t3.beforePublishHook = () =>
      if (!fired) { fired = true
        o3.append(Seq((5L, 99L)).toDF("k", "x").coalesce(1)) }
    t3.stageCounter.set(0)
    val (overlapSec, _) = time(t3.merge(delta))
    t3.beforePublishHook = () => ()
    println(f"REBASEPROBE files=$nFiles 1-overlap    ${overlapSec}%6.2f s " +
      f"stages=${t3.stageCounter.get} (full re-compose)")
    spark.stop()
  }
}
