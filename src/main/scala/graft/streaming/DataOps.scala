package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Text

/** Streaming forms of the LLM-data-pipeline operators: continuous
  * ingest is how a 100 TB corpus actually arrives, so the dedup and
  * sessionization operators need streaming twins with bounded state.
  *
  * - Dedup state is keyed by content fingerprint and, in production,
  *   bounded with `dropDuplicatesWithinWatermark` over ingest time —
  *   exact-once output per fingerprint inside the watermark horizon.
  * - Sessionization uses native `session_window` with a watermark:
  *   Spark merges/extends per-user session state and finalizes a
  *   session when the watermark passes its gap — the streaming
  *   equivalent of the batch lag+cumsum definition (B14).
  */
object DataOps {

  /** A35 — streaming exact dedup: first document per normalized-text
    * fingerprint survives. `withinWatermarkDelay` bounds state when an
    * `ingest_time` column exists (files/Kafka provide one); None keeps
    * full-history state (exact global dedup, spec/testing mode). */
  def streamDedup(docs: DataFrame,
                  withinWatermarkDelay: Option[String] = None): DataFrame =
    withinWatermarkDelay match {
      case Some(delay) =>
        docs.select(col("doc_id"), col("ingest_time"),
            md5(Text.norm(col("text")).cast("binary")).as("fingerprint"))
          .withWatermark("ingest_time", delay)
          .dropDuplicatesWithinWatermark("fingerprint")
      case None =>
        docs.select(col("doc_id"),
            md5(Text.norm(col("text")).cast("binary")).as("fingerprint"))
          .dropDuplicates("fingerprint")
    }

  /** A36 — streaming sessionization: per-user session windows with a
    * 30-minute gap over event time; a session finalizes when the
    * watermark passes its close. Emits the same (user, session start,
    * event count, exact cents value total) frame as the batch
    * lag+cumsum sessionizer.
    *
    * Boundary semantics: `session_window` closes at `start + gap`
    * exclusive, while the batch definition (B14) keeps an event at
    * EXACTLY `gap` distance in the same session (`diff > gap` splits).
    * The two differ only when consecutive events are exactly the gap
    * apart — measure zero under microsecond timestamps, absent from
    * the test data, but callers comparing the frames should know. */
  def streamSessionize(events: DataFrame, gap: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("event_time"),
        col("value"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Money.sumCents(col("value")).as("sum_value_cents"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value_cents"))
}
