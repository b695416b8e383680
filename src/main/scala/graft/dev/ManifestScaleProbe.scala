package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measures the MANIFEST write amplification the round-13
  * delta-encoded log removes. Builds a table with many data files
  * (the 100 TB stand-in variable is FILE COUNT — manifest cost scales
  * with it, not with bytes), then runs single-file appends and
  * reports each commit's slot size against the full (checkpoint)
  * manifest's: a full-per-commit log writes O(files) rows per append;
  * the delta log writes O(1) regardless of table width, paying the
  * full price only at the MaxManifestChain cadence.
  *
  * Usage: runMain graft.dev.ManifestScaleProbe [nFiles] [nAppends]
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1024)
    val nAppends = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = graft.util.Scratch.dir("graft-manifest-probe")
    val base = spark.range(nFiles.toLong * 50)
      .select(col("id").as("k"), (col("id") % 97).as("x"))
    var t0 = System.nanoTime()
    val t = graft.table.GraftTable.create(spark, root, "k",
      base.repartitionByRange(nFiles, col("k")).sortWithinPartitions("k"))
    println(f"MANIFESTPROBE files=$nFiles create ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    def slotBytes(v: Long): Long = {
      val p = new java.io.File(s"$root/commits/v$v")
      if (p.isFile) p.length
      else p.listFiles.filter(_.getName.startsWith("part-")).map(_.length).sum
    }
    def slotRows(v: Long): Long =
      spark.read.parquet(s"$root/commits/v$v").count()
    println(f"MANIFESTPROBE files=$nFiles v1(full) rows=${slotRows(1)}%6d bytes=${slotBytes(1)}%9d")
    val mx = nFiles.toLong * 50
    (1 to nAppends).foreach { i =>
      t0 = System.nanoTime()
      t.append(Seq((mx + i, i.toLong)).toDF("k", "x").coalesce(1))
      val sec = (System.nanoTime() - t0) / 1e9
      val v = t.head
      println(f"MANIFESTPROBE files=$nFiles append#$i%02d v$v ${sec}%6.2f s slot rows=${slotRows(v)}%6d bytes=${slotBytes(v)}%9d")
    }
    spark.stop()
  }
}
