package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QuerySpec, Tables}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus a decode / feature-extract /
  * frame-sample stage.
  *
  * The Spark-side plumbing is real — binary columns, typed record
  * schemas, partition-preserving `mapPartitions` with per-partition
  * (batch-shaped) iteration, codegen metadata extraction — and is what
  * matters at 100 TB: payloads never shuffle (all derivations are
  * narrow), only small typed metadata rows move.
  *
  * The actual media decoding is STUBBED: this container ships no
  * image/audio codecs, so `StubDecoder.decode` derives deterministic
  * fake media properties from the payload bytes. The decoder boundary
  * (bytes => MediaFeatures) is exactly where a real JNI/ffmpeg/pillow
  * bridge would plug in; everything around it is production-shaped.
  */
object Multimodal {

  /** typed payload record: what a media lake row looks like */
  final case class MediaRecord(
      doc_id: Long, fmt: String, payload: Array[Byte])

  /** typed decode output (per-payload features + sampled frame offsets) */
  final case class MediaFeatures(
      doc_id: Long, fmt: String, byte_len: Long, width: Int, height: Int,
      n_frames: Int, frame_offsets: Seq[Int], feat_mean: Double)

  /** The decode stub. A real implementation would hand `payload` to a
    * codec; this one derives media properties deterministically from the
    * byte stream so the full pipeline (schema, batching, oracle) is
    * testable without codecs. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.payload.length.toLong
      val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
      val width = 64 + (len % 512).toInt
      val height = 64 + ((len + b0) % 512).toInt
      val nFrames = r.fmt match {
        case "video" => 1 + (len % 30).toInt
        case "audio" => 1 + (len % 100).toInt
        case _       => 1
      }
      // frame sampling stub: every ceil(n/4)-th frame, at most 4 samples
      val step = math.max(1, (nFrames + 3) / 4)
      val offsets = (0 until nFrames by step).toSeq
      // feature stub: exact integer arithmetic surfaced as double
      val featMean = ((width * 31 + height * 17 + nFrames) % 1000) / 1000.0
      MediaFeatures(r.doc_id, r.fmt, len, width, height, nFrames, offsets, featMean)
    }
  }

  /** documents.text re-materialized as a binary media lake: payload =
    * utf-8 bytes, fmt assigned round-robin (plumbing stand-in for real
    * blobs; deterministic so oracle-checkable). */
  private def mediaLake(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(col("text"), "UTF-8").as("payload"))

  // m01 — payload metadata extraction (codegen'd, no decode needed)
  private def m01(spark: SparkSession, dir: String): DataFrame =
    mediaLake(spark, dir).select(
      col("doc_id"), col("fmt"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("content_md5"))

  private val m01Sql =
    """SELECT doc_id,
      |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS fmt,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_md5
      |FROM documents""".stripMargin

  // m02 — decode + feature-extract + frame-sample through mapPartitions.
  // The sampled offsets travel as a typed Seq through the decode stage;
  // only the OUTPUT serializes them ('|'-joined) — the driver's pandas
  // compare cannot hash raw array cells.
  private def m02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaLake(spark, dir)
      .as[MediaRecord]
      // partition-preserving imperative stage: this is the decoder batch
      // boundary (one iterator per partition ≙ one codec instance per task)
      .mapPartitions(_.map(StubDecoder.decode))
      .toDF()
      .withColumn("frame_offsets",
        concat_ws("|", col("frame_offsets").cast("array<string>")))
  }

  private val m02Sql =
    """WITH m AS (
      |  SELECT doc_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS fmt,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
      |    ascii(substring(text, 1, 1)) AS b0
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fmt, len AS byte_len,
      |    CAST(64 + len % 512 AS INT) AS width,
      |    CAST(64 + (len + b0) % 512 AS INT) AS height,
      |    CAST(CASE fmt WHEN 'video' THEN 1 + len % 30
      |                  WHEN 'audio' THEN 1 + len % 100
      |                  ELSE 1 END AS INT) AS n_frames
      |  FROM m)
      |SELECT doc_id, fmt, byte_len, width, height, n_frames,
      |  array_to_string(list_transform(
      |    generate_series(0, n_frames - 1,
      |      greatest(1, CAST((n_frames + 3) // 4 AS INT))),
      |    x -> CAST(x AS INT)), '|') AS frame_offsets,
      |  ((width * 31 + height * 17 + n_frames) % 1000) / 1000.0 AS feat_mean
      |FROM f""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("m01_multimodal_meta", m01, Some(m01Sql)),
    QuerySpec("m02_multimodal_decode", m02, Some(m02Sql)))
}
