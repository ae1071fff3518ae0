package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, batch feature extraction via partition-local iteration.
  *
  * The Spark-side mechanics are real and tested — binary column schema,
  * typed `Dataset` encoders, `mapPartitions` batch shape (the Scala
  * analogue of `mapInPandas` batches), partition-count preservation.
  * The codec itself is a clearly-marked DETERMINISTIC STUB: this
  * container ships no image/audio libraries, so `decodeStub` derives
  * features from the payload bytes instead of a real decode. Swapping
  * in a real decoder changes only the function body — schema,
  * partitioning, and batch shape stay identical.
  */
object Multimodal {

  /** A media row: payload is an opaque encoded blob + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                      declared_w: Int, declared_h: Int)

  /** Extracted features (what a real decode would produce). */
  case class MediaFeature(doc_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Build the media frame from a documents frame (batch OR streaming —
    * the projection is row-local): the text bytes stand in for an
    * encoded payload; type and declared dims derive deterministically
    * from doc_id. */
  def mediaFrom(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (lit(64) + pmod(col("doc_id"), lit(8L)) * 32L).cast("int").as("declared_w"),
        (lit(64) + pmod(col("doc_id"), lit(4L)) * 32L).cast("int").as("declared_h"))
      .as[MediaRow]
  }

  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] =
    mediaFrom(Tables.documents(spark, dir))

  /** ===== DETERMINISTIC DECODE STUB =====
    * Stands in for image decode / audio resample / video frame-sample.
    * Features are pure functions of the payload bytes so results are
    * stable across runs and partitionings — and the "content digest"
    * is the first 60 bits of md5, the same portable hash as
    * [[graft.functions.Portable.hash60]], so a DuckDB oracle can check
    * the whole frame ([[featuresSql]]) even though this path runs as
    * partition-local JVM code rather than a Catalyst expression. */
  private def decodeStub(md: java.security.MessageDigest)(r: MediaRow): MediaFeature = {
    val n = r.payload.length.toLong
    md.reset()
    val hex = md.digest(r.payload).take(8).map(b => f"$b%02x").mkString
    val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val frames = r.media_type match {
      case "video" => (n / 100L).toInt + 1   // ~1 "frame" per 100 bytes
      case "audio" => (n / 400L).toInt + 1   // coarser "chunks"
      case _       => 1
    }
    MediaFeature(r.doc_id, r.media_type, n, r.declared_w, r.declared_h, frames, checksum)
  }

  /** C12 — batch feature extraction: partition-local iteration (one
    * decoder/digest init per partition, amortized over its batch — the
    * mapInPandas batch pattern), no shuffle, typed output schema.
    * `featuresFrom` also accepts a STREAMING documents frame: the
    * decode is stateless per row, so the same mapPartitions runs
    * unchanged per micro-batch (StreamingSpec asserts equality with
    * this batch path). */
  def featuresFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    mediaFrom(docs)
      .mapPartitions { it =>
        // the codec initializes ONCE per partition, then streams the batch
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(decodeStub(md))
      }
      .toDF()
  }

  def features(spark: SparkSession, dir: String): DataFrame =
    featuresFrom(Tables.documents(spark, dir))

  /** DuckDB oracle reproducing [[features]]: the payload is the UTF-8
    * text bytes, so octet_length/md5 over the text column match the
    * JVM byte-level computation exactly. */
  val featuresSql: String =
    """SELECT doc_id,
      |  (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |  octet_length(encode(text)) AS n_bytes,
      |  CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
      |  CAST(64 + (doc_id % 4) * 32 AS INT) AS height,
      |  CAST(CASE CAST(doc_id % 3 AS INT)
      |    WHEN 2 THEN octet_length(encode(text)) // 100 + 1
      |    WHEN 1 THEN octet_length(encode(text)) // 400 + 1
      |    ELSE 1 END AS INT) AS n_frames,
      |  CAST(CONCAT('0x', SUBSTRING(MD5(text), 1, 15)) AS BIGINT) AS checksum
      |FROM documents""".stripMargin

  /** One sampled frame of a video payload. */
  case class FrameSample(doc_id: Long, frame_no: Int, frame_offset: Long,
                         frame_bytes: Long, frame_digest: Long)

  /** C33 — video frame sampling: the uniform temporal sampling every
    * frame-extraction pipeline runs before featurizing video (take
    * every `step`-th frame, at most `maxFrames` per clip). The
    * "container format" is the deterministic stub — fixed-width frames
    * of `declared_w` bytes — but the batch shape is the real one:
    * bounded row amplification (≤ maxFrames per clip, never the full
    * frame count), partition-local byte slicing with one digest init
    * per partition, no shuffle at any scale. A real demuxer changes
    * only the slicing body. */
  def frameSamples(spark: SparkSession, dir: String, step: Int = 4,
                   maxFrames: Int = 8): DataFrame =
    frameSamplesFrom(Tables.documents(spark, dir), step, maxFrames)

  /** [[frameSamples]] over any documents frame (streaming-safe: the
    * sampler is stateless per row). */
  def frameSamplesFrom(docs: DataFrame, step: Int = 4,
                       maxFrames: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    mediaFrom(docs)
      .filter(col("media_type") === "video")
      .as[MediaRow]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val stride = r.declared_w
          val nFrames = (r.payload.length + stride - 1) / stride
          (0 until nFrames).iterator
            .filter(_ % step == 0).take(maxFrames)
            .map { i =>
              val from = i * stride
              val frame = java.util.Arrays.copyOfRange(
                r.payload, from, math.min(from + stride, r.payload.length))
              md.reset()
              val hex = md.digest(frame).take(8).map(b => f"$b%02x").mkString
              FrameSample(r.doc_id, i, from.toLong, frame.length.toLong,
                java.lang.Long.parseLong(hex.substring(0, 15), 16))
            }
        }
      }
      .toDF()
  }

  /** DuckDB oracle for [[frameSamples]]: byte slicing over the UTF-8
    * text payload via substring arithmetic (the corpus is ASCII after
    * normalization upstream generated it, so char == byte offsets). */
  def frameSamplesSql(step: Int = 4, maxFrames: Int = 8): String =
    s"""WITH v AS (
       |  SELECT doc_id, text,
       |    CAST(64 + (doc_id % 8) * 32 AS INT) AS stride,
       |    octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 2
       |), f AS (
       |  SELECT doc_id, text, stride, n,
       |    UNNEST(GENERATE_SERIES(0, (n + stride - 1) // stride - 1)) AS i
       |  FROM v
       |)
       |SELECT doc_id,
       |  CAST(i AS INT) AS frame_no,
       |  CAST(i * stride AS BIGINT) AS frame_offset,
       |  CAST(LEAST(stride, n - i * stride) AS BIGINT) AS frame_bytes,
       |  CAST(CONCAT('0x', SUBSTRING(MD5(SUBSTRING(text, i * stride + 1, stride)), 1, 15))
       |    AS BIGINT) AS frame_digest
       |FROM f
       |WHERE i % $step = 0 AND i // $step < $maxFrames""".stripMargin
}
