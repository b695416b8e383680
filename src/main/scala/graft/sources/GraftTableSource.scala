package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
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
  * transactional BATCH handle (append/merge/delete): a format-level
  * blind `save()` could not express keyed upserts or txn-guarded
  * commits, and pretending otherwise invites silent non-transactional
  * writes — the same reason Delta routes batch mutations through its
  * own API/SQL verbs.
  *
  * STREAMING writes, by contrast, ARE expressible declaratively —
  * append-only micro-batches with the batch id as the idempotency
  * token — so the format registers a streaming SINK too:
  *
  * {{{
  * stream.writeStream.format("graft")
  *   .option("path", root).option("keyCol", "id")
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Each micro-batch commits through `GraftTable.streamAppend(b,
  * batchId)`: the manifest records the batch id as a `txn` marker, so
  * the batch Spark re-delivers after a failure between sink commit and
  * checkpoint write is detected and skipped (the check re-runs inside
  * the commit CAS loop) — exactly-once table contents from
  * at-least-once delivery, the same contract Delta's sink implements.
  * Append output mode only: Update/Complete would require keyed
  * rewrites per batch, which belong to the merge API. */
class GraftTableSourceProvider extends RelationProvider
    with StreamSinkProvider
    with StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  // V1 passes options case-insensitively lowercased on some paths;
  // accept both spellings
  private def opt(parameters: Map[String, String], k: String)
      : Option[String] =
    parameters.get(k).orElse(parameters.get(k.toLowerCase))
  private def required(parameters: Map[String, String], k: String): String =
    opt(parameters, k).getOrElse(
      throw new IllegalArgumentException(s"graft requires option '$k'"))

  /** keyCol option, or the MANIFEST's key stamp (round 18 — the same
    * `kind = "keyrec"` row catalog loads resolve from, so the sink and
    * the catalog can never disagree about a table's key; this also
    * closes the residual-(b) window where a sink started between a
    * key-changing REPLACE's key.conf write and its commit would have
    * keyed batches one key ahead), falling back to the storage root's
    * `key.conf` record for pre-stamp tables. Resolved to (handle key,
    * optional wrap parts by current logical name). */
  private def resolveKey(sqlContext: SQLContext,
                         parameters: Map[String, String],
                         root: String): (String, Option[Seq[String]]) =
    opt(parameters, "keyCol") match {
      case Some(k) => (k, None)
      case None =>
        val spark = sqlContext.sparkSession
        val hconf = spark.sessionState.newHadoopConf()
        // probe the stamp only when the root HAS a commit log:
        // `open` creates <root>/commits as a side effect, and a
        // fresh (or mistyped) root must fall to the friendly keyCol
        // refusal below without leaving directories behind
        val commits = new org.apache.hadoop.fs.Path(root, "commits")
        val probe =
          if (commits.getFileSystem(hconf).exists(commits))
            Some(GraftTable.open(spark, root, CompoundKey.KeyName))
          else None
        val stamped = probe.flatMap(_.keyRecordAt(-1L))
        val stored = stamped.getOrElse {
          val kp = new org.apache.hadoop.fs.Path(root, "key.conf")
          val fs = kp.getFileSystem(hconf)
          require(fs.exists(kp), "graft needs option 'keyCol' (or a " +
            "catalog-created table, whose storage root records its key)")
          val len = fs.getFileStatus(kp).getLen.toInt
          val bytes = new Array[Byte](len)
          val in = fs.open(kp)
          try in.readFully(0L, bytes) finally in.close()
          new String(bytes, "UTF-8").trim
        }
        // logicalNameOf only needs A handle on this root — reuse the
        // probe instead of re-opening (each open re-folds the
        // manifest)
        def handle: GraftTable = probe.getOrElse(
          GraftTable.open(spark, root, CompoundKey.KeyName))
        CompoundKey.partsOf(stored) match {
          case Some(parts) =>
            (CompoundKey.KeyName, Some(parts.map(handle.logicalNameOf)))
          case None =>
            (handle.logicalNameOf(stored), None)
        }
    }

  /** V1 streaming-source SCHEMA only: Spark's streaming relation
    * resolution eagerly materializes a catalog table's V1 fallback —
    * including its source schema — even when the V2 micro-batch path
    * (graft-cdf, `readStream.table`) is the one that runs. Answered
    * from the manifest (O(manifest), zero file opens). */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = schema match {
    case Some(s) => (shortName(), s)
    case None =>
      val root = required(parameters, "path")
      val (key, parts) = resolveKey(sqlContext, parameters, root)
      val t = GraftTable.open(sqlContext.sparkSession, root, key)
      val full = t.schemaAt().getOrElse(t.read().schema)
      // the compound-key storage column stays hidden, like schema()
      (shortName(),
        if (parts.isDefined)
          StructType(full.fields.filterNot(_.name == CompoundKey.KeyName))
        else full)
  }

  /** never reached while the catalog table advertises
    * MICRO_BATCH_READ (Spark prefers the V2 stream); reached only if
    * an operator force-disables the V2 reader */
  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    throw new UnsupportedOperationException(
      "graft tables stream through the V2 micro-batch source — " +
        "spark.readStream.table(...) or format(\"graft-cdf\") — not " +
        "the V1 format route")

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = required(parameters, "path")
    val key = required(parameters, "keyCol")
    // BATCH CHANGE-FEED read (Delta's readChangeFeed): the net
    // row-level feed over a version window, as a relation — the
    // catch-up/audit shape; the graft-cdf stream is the follow shape
    if (opt(parameters, "readChangeFeed").exists(_.toBoolean)) {
      val t = GraftTable.open(sqlContext.sparkSession, root, key)
      val from = opt(parameters, "startingVersion").map(_.toLong)
        .orElse(opt(parameters, "startingTimestamp")
          .map(ms => t.versionAt(ms.toLong)))
        .getOrElse(0L)
      val to = opt(parameters, "endingVersion").map(_.toLong)
        .getOrElse(t.head)
      val pre = opt(parameters, "preimages").exists(_.toBoolean)
      return new GraftChangesRelation(sqlContext, root, key, from, to, pre)
    }
    val version = opt(parameters, "versionAsOf").map(_.toLong)
      .orElse(opt(parameters, "timestampAsOf").map { ms =>
        // epoch millis → the version current at that instant (Delta's
        // TIMESTAMP AS OF, resolved once at load time)
        GraftTable.open(sqlContext.sparkSession, root, key)
          .versionAt(ms.toLong)
      })
      .getOrElse(-1L)
    new GraftTableRelation(sqlContext, root, key, version)
  }

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink is append-only ingest; got $outputMode — keyed " +
        "upserts stream through foreachBatch + merge(b, txn = batchId)")
    require(partitionColumns.isEmpty,
      "graft manages its own file layout (key-range clustering); " +
        "partitionBy is not supported")
    val root = required(parameters, "path")
    // `writeStream.toTable("gcat.t")` arrives here through Spark's V1
    // fallback with ONLY the storage location: the key resolves from
    // the root's `key.conf` (its immutable PHYSICAL name — or the
    // compound part list, whose synthesized key the sink fills per
    // batch). An explicit keyCol option (the format route) wins.
    // An 'insert'='upsert' table (x69) holds one row per key as an
    // INVARIANT — a streaming APPEND cannot keep it (batches repeat
    // keys, replays re-land them), so it refuses loudly here instead
    // of silently breaking the declared discipline.
    val ip = new org.apache.hadoop.fs.Path(root, "insert.conf")
    require(!ConfIO.readSmallFile(
        (ip.getFileSystem(sqlContext.sparkSession.sessionState
          .newHadoopConf()), ip)).exists(_.trim == "upsert"),
      "streaming append would break an 'insert'='upsert' table's " +
        "one-row-per-key invariant — stream into a staging table and " +
        "MERGE, or foreachBatch + merge(batch, txn = batchId)")
    val (key, wrapParts) = resolveKey(sqlContext, parameters, root)
    new GraftStreamSink(sqlContext, root, key, wrapParts)
  }
}

/** the V1 streaming sink: one `streamAppend` commit per micro-batch,
  * idempotent by batch id (see provider doc) */
private[sources] class GraftStreamSink(sqlContext: SQLContext,
    root: String, keyCol: String,
    wrapParts: Option[Seq[String]] = None) extends Sink {
  // one handle for the query's lifetime: reuses its memoized
  // metadata (DV target sets) across batches
  private val table =
    GraftTable.open(sqlContext.sparkSession, root, keyCol)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is the incremental plan (isStreaming leaves);
    // re-batch it Delta-style before handing it to the table's writer
    val batch = org.apache.spark.sql.graftglue.ColumnBridge.rebatch(data)
    table.streamAppend(
      wrapParts.fold(batch)(p => CompoundKey.withKey(batch, p)), batchId)
    ()
  }

  override def toString: String = s"GraftSink[$root]"
}

/** the batch change-feed relation: `changes(from, to)` as a scan —
  * `startingVersion = 0` bootstraps the `to` snapshot as pure inserts
  * (the stream source's initial-snapshot semantics, batch-shaped) */
private[sources] class GraftChangesRelation(
    override val sqlContext: SQLContext, root: String, keyCol: String,
    fromV: Long, toV: Long, preimages: Boolean)
    extends BaseRelation with TableScan {
  private def feed = {
    val t = GraftTable.open(sqlContext.sparkSession, root, keyCol)
    if (fromV == 0L)
      t.read(toV).withColumn("change_type", lit("insert"))
    else t.changes(fromV, toV, preimages = preimages)
  }
  override val schema: StructType = feed.schema
  override def buildScan(): RDD[Row] = feed.rdd
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

  /** the snapshot's on-disk bytes FROM THE MANIFEST (x44's counters) —
    * without this a V1 relation reports the session default (a huge
    * sentinel), so a join against a small graft view would NEVER
    * broadcast and every star-schema query against the format would
    * pay a shuffle it doesn't need. Manifests without recorded sizes
    * (pre-counter tables) keep the conservative default. */
  override def sizeInBytes: Long = {
    val b = GraftTable.open(sqlContext.sparkSession, root, keyCol)
      .bytesOf(pinnedVersion)
    if (b < 0) super.sizeInBytes else b
  }

  /** every filter re-checked by Spark above the scan: applying them
    * inside the inner plan (below) is purely an optimization */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    // pushed filters route through readWhere, so the FORMAT read gets
    // manifest FILE SKIPPING — min/max stats plus any bloom index —
    // before row-level filtering: a `WHERE token = '...'` against a
    // `USING graft` view opens candidate files only, exactly like the
    // Scala readWhere path. Spark re-checks every filter above the
    // scan (unhandledFilters), so pruning stays an optimization.
    val base = filters.flatMap(toColumn).reduceOption(_ && _) match {
      case Some(pred) =>
        GraftTable.open(sqlContext.sparkSession, root, keyCol)
          .readWhere(pred, pinnedVersion)
      case None => snapshot
    }
    base.select(requiredColumns.toSeq.map(col): _*).rdd
  }

  private def toColumn(f: Filter): Option[Column] =
    GraftFilterBridge.toColumn(f)
}

/** translate the pushable subset of V1 source filters to Columns —
  * anything untranslatable is simply not applied (callers re-check
  * every filter above the scan, so pushdown stays an optimization).
  * Shared by the `USING graft` relation and the [[GraftCatalog]]
  * scan. */
private[sources] object GraftFilterBridge {
  def toColumn(f: Filter): Option[Column] = f match {
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
