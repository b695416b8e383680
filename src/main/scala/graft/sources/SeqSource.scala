package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownV2Filters}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-seq` — a deterministic synthetic table as a native BATCH
  * DataSourceV2 connector with real pushdown, the library-author
  * counterpart to the streaming `ms-rate` source: where ms-rate shows
  * the MicroBatchStream surface, this shows the batch ScanBuilder
  * surface a storage connector implements — SupportsPushDownV2Filters
  * (range predicates on `id` shrink the scan itself: partitions whose
  * id range falls outside the pushed bounds are never planned, and
  * surviving partitions iterate only the in-range ids),
  * SupportsPushDownRequiredColumns (unprojected columns are never
  * materialized, not even as nulls), and SupportsPushDownAggregates
  * (COUNT(*)/MIN(id)/MAX(id) answer closed-form off the range itself —
  * one metadata partition, zero data materialization).
  *
  * Rows are a pure function of `id`, via the same 2-round
  * multiplicative mixer over Z_2^32 the KMV sketch uses (x15 —
  * portable integer arithmetic), so a DuckDB oracle reproduces the
  * table with generate_series: id ∈ [0, n), val = mix(id),
  * tag = 't' || (id % 7).
  *
  * At 100 TB the pushdown contract is the whole game for a connector:
  * a filter the source can't absorb forces a full scan no matter how
  * clever the engine above it is. The exactness argument for treating
  * pushed range filters as FULLY handled (no post-scan re-filter):
  * the bounds are integer half-open ranges intersected with [0, n) —
  * there is nothing approximate to re-check, and the oracle equality
  * proves it end to end.
  *
  * Options: `n` (row count, default 100000), `slices` (max planned
  * partitions, default 8).
  */
class SeqSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-seq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSourceProvider.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(new CaseInsensitiveStringMap(properties))
}

object SeqSourceProvider {
  val SCHEMA: StructType = new StructType()
    .add("id", LongType).add("val", LongType).add("tag", StringType)

  // the shared portable mixer (graft.util.Mix32 — ONE definition for
  // the sketch ops and this connector, so the cross-engine hash the
  // x20 oracle equality depends on cannot drift between copies)
  private[sources] def mix(i: Long): Long = graft.util.Mix32.mix(i)

  /** the oracle-side mixer as SQL text, over a column/expression `i` */
  def mixSql(i: String): String = graft.util.Mix32.sql(i)
}

private[sources] class SeqTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val n = options.getLong("n", 100000L)
  private val slices = options.getInt("slices", 8)
  override def name(): String = s"graft-seq($n)"
  override def schema(): StructType = SeqSourceProvider.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

private[sources] class SeqScanBuilder(n: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownV2Filters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = n
  private var pushed: Array[Predicate] = Array.empty
  private var required: StructType = SeqSourceProvider.SCHEMA
  private var pushedAggs: Option[Array[AggregateFunc]] = None

  /** saturating increment: the exclusive-bound conversions below add 1
    * to an inclusive bound, and `Long.MaxValue + 1` wraps to MinValue —
    * `id > MaxValue` would silently return ALL rows and
    * `id <= MaxValue` NONE, wrong results with no error since accepted
    * filters are never re-checked post-scan. Saturation keeps both
    * exact: ids live in [0, n) with n ≤ MaxValue, so id can never
    * exceed MaxValue − 1 and a MaxValue-saturated bound is still the
    * mathematically correct half-open endpoint. */
  private def satInc(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  /** a range predicate normalized to `id OP literal` form ((lit OP id)
    * flips the comparison) — None when the predicate is not a plain
    * two-child comparison of the id column against an integer literal */
  private def normalized(p: Predicate): Option[(String, Long)] = {
    def idRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference =>
          r.fieldNames.length == 1 && r.fieldNames()(0) == "id"
        case _ => false
      }
    def litVal(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value match {
            case x: java.lang.Long    => Some(x.longValue)
            case x: java.lang.Integer => Some(x.longValue)
            case x: java.lang.Short   => Some(x.longValue)
            case _                    => None
          }
        case _ => None
      }
    val c = p.children()
    if (c.length != 2) None
    else if (idRef(c(0))) litVal(c(1)).map((p.name(), _))
    else if (idRef(c(1))) litVal(c(0)).map { v =>
      (p.name() match {
        case ">" => "<"
        case "<" => ">"
        case ">=" => "<="
        case "<=" => ">="
        case other => other
      }, v)
    }
    else None
  }

  // V2 Predicate pushdown (not the legacy sources.Filter surface):
  // besides being the current connector API, it is what composes with
  // aggregate pushdown — V2ScanRelationPushDown refuses to push an
  // aggregate past V1-pushed filters (it cannot see that they were
  // handled EXACTLY), while V2-pushed predicates keep the holder
  // eligible. Found empirically in round 9: the same query pushed
  // aggregates with no WHERE clause and stopped the moment one V1
  // filter was accepted.
  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    val ops = Set(">", ">=", "<", "<=", "=")
    // IS_NOT_NULL(id) is the analyzer's inferred companion of every id
    // range predicate and is vacuously true here (ids are never null);
    // rejecting it would leave a post-scan Filter that blocks aggregate
    // pushdown (rewriteAggregate requires an empty post-scan filter list)
    def vacuous(p: Predicate): Boolean =
      p.name() == "IS_NOT_NULL" && p.children().length == 1 &&
        (p.children()(0) match {
          case r: NamedReference => r.fieldNames.length == 1
          case _ => false
        })
    val (accepted, rejected) = predicates.partition(p =>
      vacuous(p) || (ops.contains(p.name()) && normalized(p).isDefined))
    accepted.flatMap(normalized(_)).foreach {
      case (">=", v) => lo = math.max(lo, v)
      case (">", v)  => lo = math.max(lo, satInc(v))
      case ("<", v)  => hi = math.min(hi, v)
      case ("<=", v) => hi = math.min(hi, satInc(v))
      case ("=", v)  =>
        lo = math.max(lo, v); hi = math.min(hi, satInc(v))
      case _ => ()
    }
    pushed = accepted
    // exact integer range handling: accepted predicates need no
    // post-scan re-evaluation — only the rejected remainder goes back
    rejected
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown (COUNT(*) / MIN(id) / MAX(id)) ------------
  // Every supported aggregate is CLOSED-FORM on the pushed integer
  // range [lo, hi): count = hi − lo, min = lo, max = hi − 1 — so a
  // pushed-aggregate scan plans ONE metadata partition emitting one
  // arithmetic row and never materializes a single data column. That
  // is the full connector pushdown story (filters + columns +
  // aggregates): a 100 TB COUNT(*) against this source costs nothing
  // but the plan. Complete pushdown (not partial): Spark plans a bare
  // Project on top, no re-aggregation — sound because the range
  // filters this source accepts are handled exactly (see pushFilters),
  // and Spark only attempts aggregate pushdown when no post-scan
  // filter remains.

  private def idColumn(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference =>
        r.fieldNames.length == 1 && r.fieldNames()(0) == "id"
      case _ => false
    }

  private def supported(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => idColumn(m.column)
      case m: Max => idColumn(m.column)
      case _ => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    supported(agg) && {
      pushedAggs = Some(agg.aggregateExpressions)
      true
    }

  override def build(): Scan = pushedAggs match {
    case Some(aggs) => new SeqAggScan(lo, math.max(lo, hi), aggs)
    case None => new SeqScan(lo, math.max(lo, hi), slices, required)
  }
}

/** the pushed-aggregate scan: one partition, one closed-form row, zero
  * data-column materialization (MIN/MAX are nullable — an empty pushed
  * range yields (0, null, null), matching Spark's global-aggregate
  * semantics on empty input) */
private[sources] class SeqAggScan(lo: Long, hi: Long,
                                  aggs: Array[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq range=[$lo, $hi) pushed-aggregates=" +
      aggs.map(_.toString).mkString(",")

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqPartition(0L, 1L)) // one metadata partition, one row

  override def createReaderFactory(): PartitionReaderFactory = {
    // evaluate the closed forms DRIVER-side and ship only the row's
    // values (the factory must serialize; the Scan itself must not)
    val empty = hi <= lo
    val values: Array[Any] = aggs.map {
      case _: CountStar => (math.max(0L, hi - lo)): java.lang.Long
      case _: Min => if (empty) null else (lo: java.lang.Long)
      case _: Max => if (empty) null else ((hi - 1): java.lang.Long)
      case other => throw new IllegalStateException(
        s"unsupported pushed aggregate $other") // unreachable: gated by supported()
    }
    SeqAggReaderFactory(values)
  }
}

private[sources] case class SeqAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

private[sources] class SeqScan(lo: Long, hi: Long, slices: Int,
                               schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq range=[$lo, $hi) cols=${schema.fieldNames.mkString(",")}"

  /** only in-range slices are planned: the pushdown's visible effect */
  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    if (total == 0) return Array.empty
    val k = math.min(slices.toLong, total).toInt
    (0 until k).map { p =>
      val s = lo + p * total / k
      val e = lo + (p + 1) * total / k
      SeqPartition(s, e): InputPartition
    }.filter { case SeqPartition(s, e) => e > s }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema.fieldNames)
}

private[sources] case class SeqPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val SeqPartition(start, end) = p
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow = {
        // projected column set only — pruned columns never materialize
        val vals = cols.map {
          case "id"  => i: java.lang.Long
          case "val" => SeqSourceProvider.mix(i): java.lang.Long
          case "tag" => UTF8String.fromString("t" + (i % 7))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
