package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QuerySpec, Tables}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus decode / feature-extract /
  * frame-sample (m02) and resize (m03) stages.
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

  /** typed resize output: target dims + the downsampled payload's
    * fingerprint (the payload itself stays binary and never shuffles) */
  final case class ResizedMedia(
      doc_id: Long, fmt: String, width: Int, height: Int,
      tgt_w: Int, tgt_h: Int, resized_len: Long, resized_md5: String)

  /** The resize stub: aspect-preserving integer downscale to a 256-px
    * bounding box (no-op when already inside it). A real implementation
    * would hand payload + target dims to a codec; the stub "resample"
    * keeps the leading len·256/maxside bytes — deterministic, so the
    * oracle reproduces it — and everything around it (typed schema,
    * narrow per-partition stage, fingerprint-not-payload output) is the
    * production shape. */
  object StubResizer {
    private val BOX = 256
    def resize(r: MediaRecord): ResizedMedia = {
      val f = StubDecoder.decode(r)
      val mx = math.max(f.width, f.height).toLong
      val (tw, th, rlen) =
        if (mx <= BOX) (f.width, f.height, f.byte_len)
        else ((f.width * BOX / mx).toInt, (f.height * BOX / mx).toInt,
              math.max(1L, f.byte_len * BOX / mx))
      val head = java.util.Arrays.copyOfRange(r.payload, 0,
        math.min(rlen, r.payload.length.toLong).toInt)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(head).map("%02x".format(_)).mkString
      ResizedMedia(f.doc_id, f.fmt, f.width, f.height, tw, th, rlen, md5)
    }
  }

  // m03 — resize: the remaining stage of the decode / feature-extract /
  // resize / frame-sample quartet (m02 covers the other three). Narrow
  // mapPartitions over the lake — payloads never shuffle; only dims and
  // a 32-byte fingerprint leave the stage.
  private def m03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaLake(spark, dir).as[MediaRecord]
      .mapPartitions(_.map(StubResizer.resize))
      .toDF()
  }

  /** text is ASCII in this corpus (m02's oracle already leans on
    * ascii(substring(text,1,1)) ≡ payload byte 0), so byte-slicing the
    * payload ≡ substring on the text — which keeps the md5 comparable. */
  private val m03Sql =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS fmt,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
      |    ascii(substring(text, 1, 1)) AS b0
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text, fmt, len,
      |    CAST(64 + len % 512 AS INT) AS width,
      |    CAST(64 + (len + b0) % 512 AS INT) AS height
      |  FROM m),
      |r AS (
      |  SELECT doc_id, text, fmt, len, width, height,
      |    greatest(width, height) AS mx
      |  FROM f)
      |SELECT doc_id, fmt, width, height,
      |  CAST(CASE WHEN mx <= 256 THEN width  ELSE width  * 256 // mx END AS INT) AS tgt_w,
      |  CAST(CASE WHEN mx <= 256 THEN height ELSE height * 256 // mx END AS INT) AS tgt_h,
      |  CASE WHEN mx <= 256 THEN len ELSE greatest(1, len * 256 // mx) END AS resized_len,
      |  md5(substring(text, 1,
      |    CAST(CASE WHEN mx <= 256 THEN len ELSE greatest(1, len * 256 // mx) END AS INT)))
      |    AS resized_md5
      |FROM r""".stripMargin

  // m04 — frame-table materialization: explode each payload's SAMPLED
  // frames (m02 computes the offsets and keeps them packed; this is
  // the downstream step a vision-training pipeline actually runs —
  // one ROW per sampled frame, carrying a per-frame fingerprint, so
  // frames become a first-class dataset to dedup/shuffle/pack).
  //
  // The "frame read" is the stub boundary: a real codec would decode
  // the frame at `frame_off`; the stub fingerprints the 32-byte
  // payload slice the offset points at (seek = off·32 mod len — fake
  // but deterministic, so the oracle reproduces it; corpus is ASCII,
  // so byte-slicing the payload ≡ substring on the text, the m03
  // precedent). Everything around the stub is the production shape:
  // the explode is NARROW (payloads never shuffle; each task fans its
  // own rows out), the per-frame output carries a fingerprint + typed
  // metadata rather than pixels, and row volume is bounded by the
  // sampling policy (≤4 frames/payload), not the media length.
  private def m04(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        col("text"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("len", length(col("payload")).cast("long"))
      .withColumn("n_frames", expr(
        "CAST(CASE fmt WHEN 'video' THEN 1 + len % 30" +
          " WHEN 'audio' THEN 1 + len % 100 ELSE 1 END AS INT)"))
      .withColumn("step",
        greatest(lit(1), expr("CAST((n_frames + 3) div 4 AS INT)")))
      .select(col("doc_id"), col("fmt"), col("n_frames"), col("payload"),
        col("len"), col("step"),
        explode(expr("sequence(0, n_frames - 1, step)")).as("frame_off"))
      .select(col("doc_id"), col("fmt"), col("n_frames"),
        expr("CAST(frame_off div step AS INT)").as("frame_idx"),
        col("frame_off"),
        md5(expr(
          "substring(payload, CAST(frame_off * 32 % greatest(len, 1) + 1 AS INT), 32)"))
          .as("frame_md5"))

  private val m04Sql =
    """WITH m AS (
      |  SELECT doc_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS fmt,
      |    text, CAST(octet_length(encode(text)) AS BIGINT) AS len
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fmt, text, len,
      |    CAST(CASE fmt WHEN 'video' THEN 1 + len % 30
      |                  WHEN 'audio' THEN 1 + len % 100
      |                  ELSE 1 END AS INT) AS n_frames
      |  FROM m),
      |g AS (
      |  SELECT doc_id, fmt, text, len, n_frames,
      |    greatest(1, CAST((n_frames + 3) // 4 AS INT)) AS step
      |  FROM f)
      |SELECT doc_id, fmt, n_frames,
      |  CAST(frame_off // step AS INT) AS frame_idx,
      |  frame_off,
      |  md5(substring(text,
      |    CAST(frame_off * 32 % greatest(len, 1) + 1 AS INT), 32))
      |    AS frame_md5
      |FROM (
      |  SELECT doc_id, fmt, text, len, n_frames, step,
      |    unnest(generate_series(0, n_frames - 1, step)) AS frame_off
      |  FROM g) t""".stripMargin

  // m05 — MEDIA NEAR-DUP detection over the frame table (the
  // multimodal × dedup composition a video-training pipeline runs:
  // re-uploads and re-encodes of the same asset share sampled-frame
  // fingerprints even when file-level hashes differ). d02's shape on
  // m04's rows: frame_md5 plays the shingle — distinct per doc,
  // df-capped so a fingerprint shared by more than M05_DF_CAP media
  // (boilerplate intros, test cards — here: the corpus's repetitive
  // text) never fans out into pairs — then same-fingerprint join,
  // per-pair shared counts, and an integer-exact Jaccard in permille
  // (floor division in both engines). With the byte-exact stub
  // fingerprint only true re-uploads match (jac = 1000); a real
  // deployment swaps in a perceptual hash at the same boundary and
  // the pipeline around it is unchanged.
  //
  // 100 TB shape: payloads never move — only (doc_id, 32-byte md5)
  // pairs shuffle; the df cap bounds the same-fingerprint join's
  // fan-out exactly like d02's shingle cap, and output volume is
  // pair-of-actual-dup-proportional.
  private val M05_DF_CAP = 16
  private val M05_JAC_PM = 500 // keep pairs sharing >= half their frames

  private def m05(spark: SparkSession, dir: String): DataFrame = {
    val frames = m04(spark, dir)
      .select(col("doc_id"), col("frame_md5")).distinct()
    val rare = frames.groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= M05_DF_CAP)
      .select(col("frame_md5"))
    val capped = frames.join(rare, Seq("frame_md5"))
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = capped.as("a")
      .join(capped.as("b"), Seq("frame_md5"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .withColumn("jac_pm",
        expr("CAST(shared * 1000 DIV (n_a + n_b - shared) AS BIGINT)"))
      .where(col("jac_pm") >= M05_JAC_PM)
      .select(col("doc_a"), col("doc_b"), col("shared"),
              col("n_a"), col("n_b"), col("jac_pm"))
  }

  private val m05Sql =
    s"""WITH frames0 AS (SELECT * FROM (${m04Sql}) z),
       |frames AS (SELECT DISTINCT doc_id, frame_md5 FROM frames0),
       |rare AS (
       |  SELECT frame_md5 FROM frames
       |  GROUP BY 1 HAVING COUNT(*) <= $M05_DF_CAP),
       |capped AS (SELECT f.doc_id, f.frame_md5
       |           FROM frames f JOIN rare USING (frame_md5)),
       |sizes AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM capped GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared
       |  FROM capped a JOIN capped b
       |    ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT * FROM (
       |  SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
       |    CAST(shared * 1000 // (sa.n + sb.n - shared) AS BIGINT) AS jac_pm
       |  FROM pairs
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b) t
       |WHERE jac_pm >= $M05_JAC_PM""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("m01_multimodal_meta", m01, Some(m01Sql)),
    QuerySpec("m02_multimodal_decode", m02, Some(m02Sql)),
    QuerySpec("m03_multimodal_resize", m03, Some(m03Sql)),
    QuerySpec("m04_multimodal_frame_table", m04, Some(m04Sql)),
    QuerySpec("m05_multimodal_frame_dedup", m05, Some(m05Sql)))
}
