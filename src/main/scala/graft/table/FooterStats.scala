package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Write-time file statistics FROM PARQUET FOOTERS — the metadata the
  * files already carry, instead of a second read over the bytes just
  * written (the round-10 2× ingest read amplification). This is how
  * the real formats do it: Iceberg lifts its per-column inclusive
  * metrics and Delta its stats struct straight from footer/row-group
  * metadata, which is a few KB per file no matter how big the file is.
  *
  * Soundness notes:
  *  - per-column (min, max) is the fold over row groups that have a
  *    non-null value; a column with no such row group reports nothing
  *    (exactly the "all-NULL ⇒ no stats ⇒ always a candidate"
  *    degradation the planner already documents);
  *  - binary (string) bounds use parquet's unsigned-byte ordering —
  *    the SAME ordering Spark's UTF8String comparisons use, so string
  *    pruning decisions agree with the engine's own filters; a writer
  *    that truncated binary stats truncates min DOWN and max UP, so
  *    truncated bounds are still valid bounds;
  *  - row counts come from block metadata (exact by definition).
  */
object FooterStats {

  /** one file's footer-derived statistics. `nulls` carries a column's
    * EXACT null count only when every row group recorded one (a single
    * group without a count makes the file's total unknowable — the
    * column is simply absent, and planning treats it as unbounded). */
  final case class FileStat(rows: Long,
                            intStats: Map[String, (Long, Long)],
                            strStats: Map[String, (String, String)],
                            nulls: Map[String, Long] = Map.empty)

  /** total row count of one parquet file — footer metadata only */
  def rowCount(file: String, conf: Configuration = new Configuration()): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
    finally r.close()
  }

  /** footer stats of one file: row count plus (min, max) for every
    * top-level INT32/INT64 column in `intCols` and every BINARY(UTF8)
    * column in `strCols` (names in the file's physical schema).
    *
    * A row group whose chunk carries NO usable min/max while it may
    * still hold non-NULL values INVALIDATES the column's bounds for
    * the whole file (Iceberg does the same): parquet-mr omits binary
    * min/max from the footer past MAX_STATS_SIZE (4 KB), so a
    * multi-row-group file with one large-string group would otherwise
    * report bounds that exclude that group's values and a DELETE/MERGE
    * planned off them would silently miss rows. Ignoring the group is
    * sound ONLY when its recorded null count proves every row NULL. */
  def read(file: String, intCols: Set[String], strCols: Set[String],
           conf: Configuration = new Configuration()): FileStat = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount.toLong).sum
      var ints = Map.empty[String, (Long, Long)]
      var strs = Map.empty[String, (String, String)]
      var invalid = Set.empty[String]
      var nulls = Map.empty[String, Long]
      var nullsUnknown = Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        // top-level columns AND struct-nested leaves (round 18): the
        // footer's column path IS the dotted struct path — the caller
        // names the leaves it wants (arrays/maps are never named)
        val path = c.getPath.toArray
        val name = path.mkString(".")
        if (intCols(name) || strCols(name)) {
          val st = c.getStatistics
          // exact per-column NULL COUNTS (Iceberg's null_value_counts):
          // valid only when every row group recorded one
          if (st != null && !st.isEmpty && st.isNumNullsSet)
            nulls = nulls.updated(name,
              nulls.getOrElse(name, 0L) + st.getNumNulls)
          else nullsUnknown += name
          if (st != null && !st.isEmpty && st.hasNonNullValue) {
            c.getPrimitiveType.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT32 if intCols(name) =>
                val lo = st.genericGetMin.asInstanceOf[Number].longValue
                val hi = st.genericGetMax.asInstanceOf[Number].longValue
                ints = merge(ints, name, lo, hi)
              case PrimitiveTypeName.INT64 if intCols(name) =>
                val lo = st.genericGetMin.asInstanceOf[Number].longValue
                val hi = st.genericGetMax.asInstanceOf[Number].longValue
                ints = merge(ints, name, lo, hi)
              case PrimitiveTypeName.BINARY if strCols(name) =>
                val lo = st.genericGetMin
                  .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                val hi = st.genericGetMax
                  .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                strs = mergeS(strs, name, lo, hi)
              case _ => ()
            }
          } else {
            // no usable min/max for this group: sound to skip only when
            // the null count proves the group all-NULL; otherwise the
            // column's file-level bounds are unknowable — drop them
            val provablyAllNull = st != null && !st.isEmpty &&
              st.isNumNullsSet && st.getNumNulls >= b.getRowCount
            if (b.getRowCount > 0 && !provablyAllNull) invalid += name
          }
        }
      }
      FileStat(rows, ints -- invalid, strs -- invalid,
        nulls -- nullsUnknown)
    } finally r.close()
  }

  /** footer stats for a SET of files, read in parallel on the cluster
    * (a big append stages thousands of files; each footer is a few KB,
    * but the open() round-trips shouldn't serialize on the driver).
    * Reads go through the SESSION's Hadoop configuration — broadcast
    * as a [[org.apache.spark.util.SerializableConfiguration]] to the
    * executor path — so `spark.hadoop.*` / filesystem settings apply
    * the moment table paths leave the default local FS (the round-11
    * advisor's bare-`new Configuration()` fix). */
  def readAll(spark: org.apache.spark.sql.SparkSession, files: Seq[String],
              intCols: Set[String], strCols: Set[String])
      : Map[String, FileStat] = {
    if (files.isEmpty) return Map.empty
    val conf = spark.sessionState.newHadoopConf()
    if (files.size <= 4) // driver-local fast path: no job for tiny commits
      return files.map(f => f -> read(f, intCols, strCols, conf)).toMap
    val slices = math.min(files.size, 32)
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    spark.sparkContext.parallelize(files, slices)
      .map(f => f -> read(f, intCols, strCols, sconf.value))
      .collect().toMap
  }

  private def merge(m: Map[String, (Long, Long)], k: String,
                    lo: Long, hi: Long): Map[String, (Long, Long)] =
    m.get(k) match {
      case Some((l, h)) => m.updated(k, (math.min(l, lo), math.max(h, hi)))
      case None => m.updated(k, (lo, hi))
    }

  /** unsigned-UTF-8-byte ordering — parquet's binary stats ordering and
    * Spark's UTF8String ordering agree on it; java.lang.String.compareTo
    * does NOT for supplementary characters, so every driver-side string
    * comparison in planning goes through [[byteCompare]]. */
  def byteCompare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def mergeS(m: Map[String, (String, String)], k: String,
                     lo: String, hi: String): Map[String, (String, String)] =
    m.get(k) match {
      case Some((l, h)) => m.updated(k,
        (if (byteCompare(lo, l) < 0) lo else l,
         if (byteCompare(hi, h) > 0) hi else h))
      case None => m.updated(k, (lo, hi))
    }
}
