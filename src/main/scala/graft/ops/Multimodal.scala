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

  /** Build the media frame from `documents`: the text bytes stand in
    * for an encoded payload; type and declared dims derive
    * deterministically from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (lit(64) + pmod(col("doc_id"), lit(8L)) * 32L).cast("int").as("declared_w"),
        (lit(64) + pmod(col("doc_id"), lit(4L)) * 32L).cast("int").as("declared_h"))
      .as[MediaRow]
  }

  /** ===== DETERMINISTIC DECODE STUB =====
    * Stands in for image decode / audio resample / video frame-sample.
    * Features are pure functions of the payload bytes so results are
    * stable across runs and partitionings. */
  private def decodeStub(r: MediaRow): MediaFeature = {
    val n = r.payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff).toLong * (i + 1); i += 1 }
    val frames = r.media_type match {
      case "video" => (n / 100L).toInt + 1   // ~1 "frame" per 100 bytes
      case "audio" => (n / 400L).toInt + 1   // coarser "chunks"
      case _       => 1
    }
    MediaFeature(r.doc_id, r.media_type, n, r.declared_w, r.declared_h, frames, sum)
  }

  /** C12 — batch feature extraction: partition-local iteration (one
    * "decoder init" per partition, amortized over its batch — the
    * mapInPandas batch pattern), no shuffle, typed output schema. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it =>
        // real impl: initialize the codec ONCE here, then stream the batch
        it.map(decodeStub)
      }
      .toDF()
  }
}
