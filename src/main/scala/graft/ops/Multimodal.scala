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
}
