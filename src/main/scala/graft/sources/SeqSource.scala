package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-seq` — a deterministic synthetic table as a native BATCH
  * DataSourceV2 connector with real pushdown, the library-author
  * counterpart to the streaming `ms-rate` source: where ms-rate shows
  * the MicroBatchStream surface, this shows the batch ScanBuilder
  * surface a storage connector implements — SupportsPushDownFilters
  * (range predicates on `id` shrink the scan itself: partitions whose
  * id range falls outside the pushed bounds are never planned, and
  * surviving partitions iterate only the in-range ids) and
  * SupportsPushDownRequiredColumns (unprojected columns are never
  * materialized, not even as nulls).
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = n
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSourceProvider.SCHEMA

  private def num(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case _       => None
  }

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

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("id", v) => num(v).isDefined
      case GreaterThan("id", v)        => num(v).isDefined
      case LessThan("id", v)           => num(v).isDefined
      case LessThanOrEqual("id", v)    => num(v).isDefined
      case EqualTo("id", v)            => num(v).isDefined
      case _                           => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v).get)
      case GreaterThan("id", v)        => lo = math.max(lo, satInc(num(v).get))
      case LessThan("id", v)           => hi = math.min(hi, num(v).get)
      case LessThanOrEqual("id", v)    => hi = math.min(hi, satInc(num(v).get))
      case EqualTo("id", v) =>
        lo = math.max(lo, num(v).get); hi = math.min(hi, satInc(num(v).get))
      case _ => ()
    }
    pushed = accepted
    // exact integer range handling: accepted filters need no post-scan
    // re-evaluation — only the rejected remainder goes back to Spark
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), slices, required)
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
