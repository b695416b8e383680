package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import graft.table.GraftTable.FileRef

/** DRIVER-LOCAL manifest slot I/O (round-18 optimization, guide §1/§2:
  * remove whole Spark jobs, not just shuffle bytes). A manifest slot is
  * a few KB-MB of metadata — reading it as `spark.read.parquet(...).
  * collect()` and writing it as `toDF.coalesce(1).write.parquet(...)`
  * paid a full Spark job (plan + schedule + commit protocol, ~0.1-0.3 s
  * of driver latency) PER SLOT TOUCH; a mutation lifecycle query folds
  * and publishes dozens of slots, so the job cadence — not the data —
  * was its gate time (x58 profile: ~105 Spark jobs, 8.6 s of driver
  * gaps for ~2 s of task work). Delta Lake reads its JSON log exactly
  * this way: on the driver, with Spark jobs reserved for data.
  *
  * The on-disk format is UNCHANGED and bidirectionally compatible: the
  * writer produces the same columns, logical types and nullability
  * Spark's parquet writer emitted for the old `toDF` tuple schema
  * (standard-mode MAP key_value encoding, snappy), so slots written by
  * either writer read identically through either reader — pinned by
  * SlotIOSpec round-trips in both directions. The reader tolerates the
  * same legacy column absences [[GraftTable.readSlot]] did (pre-stats,
  * pre-ts, pre-txn slots degrade to empty maps / -1 sentinels).
  */
private[table] object SlotIO {

  /** the slot schema Spark wrote for
    * (file, kind, lo, hi, txn, stats, sstats, rows, bytes, ts, nstats,
    * zgen, schema_json) — names, logical types and repetition match
    * ScalaReflection + ParquetWriteSupport output byte-for-byte. */
  private val SlotSchema: MessageType = {
    val string = LogicalTypeAnnotation.stringType()
    def mapOf(name: String, value: Type): GroupType =
      Types.optionalMap()
        .key(Types.required(PrimitiveTypeName.BINARY).as(string)
          .named("key"))
        .value(value)
        .named(name)
    Types.buildMessage()
      .addField(Types.optional(PrimitiveTypeName.BINARY).as(string)
        .named("file"))
      .addField(Types.optional(PrimitiveTypeName.BINARY).as(string)
        .named("kind"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("lo"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("hi"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("txn"))
      .addField(mapOf("stats", Types.optionalGroup()
        .addField(Types.required(PrimitiveTypeName.INT64).named("_1"))
        .addField(Types.required(PrimitiveTypeName.INT64).named("_2"))
        .named("value")))
      .addField(mapOf("sstats", Types.optionalGroup()
        .addField(Types.optional(PrimitiveTypeName.BINARY).as(string)
          .named("_1"))
        .addField(Types.optional(PrimitiveTypeName.BINARY).as(string)
          .named("_2"))
        .named("value")))
      .addField(Types.required(PrimitiveTypeName.INT64).named("rows"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("bytes"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("ts"))
      .addField(mapOf("nstats",
        Types.required(PrimitiveTypeName.INT64).named("value")))
      .addField(Types.required(PrimitiveTypeName.INT64).named("zgen"))
      .addField(Types.optional(PrimitiveTypeName.BINARY).as(string)
        .named("schema_json"))
      .named("spark_schema")
  }

  /** write `refs` (with the commit-level txn id and in-commit stamp on
    * every row, exactly as the old tuple projection did) as ONE parquet
    * part file under the slot directory `dir` — no Spark job. */
  def write(dir: String, refs: Seq[FileRef], txn: Long, ts: Long,
            conf: Configuration): Unit = {
    val fs = new Path(dir).getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    val part = new Path(dir,
      s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    val w: ParquetWriter[Group] = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(part, conf))
      .withType(SlotSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(SlotSchema)
    try refs.foreach { r =>
      val g = factory.newGroup()
      g.add("file", r.file)
      g.add("kind", r.kind)
      g.add("lo", r.lo)
      g.add("hi", r.hi)
      g.add("txn", txn)
      val stats = g.addGroup("stats")
      r.stats.foreach { case (k, (lo, hi)) =>
        val kv = stats.addGroup("key_value")
        kv.add("key", k)
        val v = kv.addGroup("value")
        v.add("_1", lo); v.add("_2", hi)
      }
      val sstats = g.addGroup("sstats")
      r.sstats.foreach { case (k, (lo, hi)) =>
        val kv = sstats.addGroup("key_value")
        kv.add("key", k)
        val v = kv.addGroup("value")
        v.add("_1", lo); v.add("_2", hi)
      }
      g.add("rows", r.rows)
      g.add("bytes", r.bytes)
      g.add("ts", ts)
      val nstats = g.addGroup("nstats")
      r.nstats.foreach { case (k, n) =>
        val kv = nstats.addGroup("key_value")
        kv.add("key", k)
        kv.add("value", n)
      }
      g.add("zgen", r.zgen)
      g.add("schema_json", r.schemaJson)
      w.write(g)
    } finally w.close()
  }

  /** read a slot — either a directory of part files (rename arbiter)
    * or one bare parquet FILE at the slot name (conditional-put
    * arbiter), the same duality `spark.read.parquet` absorbed — with
    * no Spark job. Returns the decoded refs (unsorted: the caller
    * sorts, matching the old readSlot) plus the commit-level (txn, ts)
    * maxima. */
  def read(dir: String, conf: Configuration): (Seq[FileRef], Long, Long) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val parts =
      if (fs.getFileStatus(d).isFile) Seq(d)
      else fs.listStatus(d).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val refs = Vector.newBuilder[FileRef]
    var commitTxn = -1L
    var anyTxn = false
    // intern per-file schema strings (see readSlot's note: a snapshot
    // has a handful of DISTINCT schemas across up to 10⁵-10⁶ refs)
    val interned = scala.collection.mutable.HashMap.empty[String, String]
    parts.foreach { p =>
      val in = HadoopInputFile.fromPath(p, conf)
      val fileSchema = {
        val fr = ParquetFileReader.open(in)
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      }
      val names = fileSchema.getFields.asScala.map(_.getName).toSet
      val hasStats = names("stats")
      val hasSStats = names("sstats")
      val hasCounts = names("rows") && names("bytes")
      val hasTs = names("ts")
      val hasNStats = names("nstats")
      val hasZgen = names("zgen")
      val hasSchema = names("schema_json")
      val hasTxn = names("txn")
      if (hasTxn) anyTxn = true
      val reader = ParquetReader
        .builder(new GroupReadSupport(), p).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          def has(f: String): Boolean = g.getFieldRepetitionCount(f) > 0
          def str(f: String): String =
            if (has(f)) g.getString(f, 0) else null
          def lng(f: String, dflt: Long): Long =
            if (has(f)) g.getLong(f, 0) else dflt
          def mapEntries(f: String): Seq[Group] = {
            if (!has(f)) return Nil
            val m = g.getGroup(f, 0)
            if (m.getType.asGroupType().getFieldCount == 0) Nil
            else {
              val kvField = m.getType.asGroupType().getFieldName(0)
              (0 until m.getFieldRepetitionCount(kvField))
                .map(i => m.getGroup(kvField, i))
            }
          }
          val stats =
            if (!hasStats) Map.empty[String, (Long, Long)]
            else mapEntries("stats").flatMap { kv =>
              if (kv.getFieldRepetitionCount("value") == 0) None
              else {
                val v = kv.getGroup("value", 0)
                Some(kv.getString("key", 0) ->
                  (v.getLong("_1", 0), v.getLong("_2", 0)))
              }
            }.toMap
          val sstats =
            if (!hasSStats) Map.empty[String, (String, String)]
            else mapEntries("sstats").flatMap { kv =>
              if (kv.getFieldRepetitionCount("value") == 0) None
              else {
                val v = kv.getGroup("value", 0)
                Some(kv.getString("key", 0) ->
                  (v.getString("_1", 0), v.getString("_2", 0)))
              }
            }.toMap
          val nstats =
            if (!hasNStats) Map.empty[String, Long]
            else mapEntries("nstats").map(kv =>
              kv.getString("key", 0) -> kv.getLong("value", 0)).toMap
          val schemaJson =
            if (!hasSchema) ""
            else {
              val s = str("schema_json")
              if (s == null) "" else interned.getOrElseUpdate(s, s)
            }
          refs += FileRef(str("file"), str("kind"),
            lng("lo", -1L), lng("hi", -1L),
            stats, sstats,
            rows = if (hasCounts) lng("rows", -1L) else -1L,
            bytes = if (hasCounts) lng("bytes", -1L) else -1L,
            ts = if (hasTs) lng("ts", -1L) else -1L,
            nstats = nstats,
            zgen = if (hasZgen) lng("zgen", -1L) else -1L,
            schemaJson = schemaJson)
          if (hasTxn) commitTxn = math.max(commitTxn, lng("txn", -1L))
          g = reader.read()
        }
      } finally reader.close()
    }
    val out = refs.result()
    val commitTs = out.foldLeft(-1L)((m, r) => math.max(m, r.ts))
    (out, if (anyTxn) commitTxn else -1L, commitTs)
  }
}
