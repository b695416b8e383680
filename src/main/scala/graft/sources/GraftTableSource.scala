package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/** `graft` — BATCH read of a [[GraftTable]] as a registered Spark data
  * source, so a table is reachable from the DataFrame reader AND from
  * pure SQL with no Scala handle in sight:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("path", root).option("keyCol", "id")
  *   .option("versionAsOf", "3")      // optional time travel
  *   .load()
  *
  * CREATE TEMPORARY VIEW t USING graft
  *   OPTIONS (path '<root>', keyCol 'id')   -- then: SELECT ... FROM t
  * }}}
  *
  * Implemented as a V1 relation that DELEGATES to the handle's own
  * snapshot plan — `t.read(version)` is already DV-applied and
  * schema-merged, and runs through Catalyst like any DataFrame, so
  * column pruning requested by the outer query reaches the inner
  * parquet scan (`buildScan` selects exactly `requiredColumns`) and
  * pushable filters apply inside the inner plan (declared UNHANDLED so
  * Spark re-checks them above the scan — pushdown here is an
  * optimization, never a correctness dependency). Writes stay on the
  * transactional handle (append/merge/delete/streamAppend): a
  * format-level blind `save()` could not express keyed upserts or
  * txn-guarded commits, and pretending otherwise invites silent
  * non-transactional writes — the same reason Delta routes mutations
  * through its own API/SQL verbs. */
class GraftTableSourceProvider extends RelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    // V1 passes options case-insensitively lowercased on some paths;
    // accept both spellings
    def opt(k: String): Option[String] =
      parameters.get(k).orElse(parameters.get(k.toLowerCase))
    val root = opt("path").getOrElse(
      throw new IllegalArgumentException("graft requires option 'path'"))
    val key = opt("keyCol").getOrElse(
      throw new IllegalArgumentException("graft requires option 'keyCol'"))
    val version = opt("versionAsOf").map(_.toLong).getOrElse(-1L)
    new GraftTableRelation(sqlContext, root, key, version)
  }
}

private[sources] class GraftTableRelation(
    override val sqlContext: SQLContext, root: String, keyCol: String,
    version: Long) extends BaseRelation with PrunedFilteredScan {

  /** the version is PINNED at relation creation (load/view time):
    * a DataFrame is an immutable snapshot, so re-executing it after
    * concurrent commits re-reads the SAME version, never a newer
    * head — Delta pins its snapshot at analysis the same way */
  private val pinnedVersion: Long =
    if (version >= 0) version
    else GraftTable.open(sqlContext.sparkSession, root, keyCol).head

  private def snapshot =
    GraftTable.open(sqlContext.sparkSession, root, keyCol)
      .read(pinnedVersion)

  override val schema: StructType = snapshot.schema

  /** every filter re-checked by Spark above the scan: applying them
    * inside the inner plan (below) is purely an optimization */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val pruned = snapshot.select(requiredColumns.toSeq.map(col): _*)
    val filtered = filters.flatMap(toColumn)
      .foldLeft(pruned)((d, c) => d.where(c))
    filtered.rdd
  }

  /** translate the pushable subset of source filters to Columns —
    * anything untranslatable is simply not applied here (Spark
    * re-applies every filter anyway) */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === v)
    case GreaterThan(a, v)        => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v)           => Some(col(a) < v)
    case LessThanOrEqual(a, v)    => Some(col(a) <= v)
    case In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(x) => toColumn(x).map(!_)
    case _ => None
  }
}
