package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros, lit}
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  /** Parquet file schemas memoized per path: every `spark.read.parquet`
    * WITHOUT a user schema runs footer-based schema inference on the
    * driver before planning — and a bench/verify session opens the same
    * ten files hundreds of times (several times per query: most
    * operators scan a table 2-4 times in one plan). The schema is pure
    * FILE metadata (no session state, no row data — caching it is the
    * catalog behavior every metastore-backed table gets for free), so
    * the memo is keyed on path alone and never needs eviction; the
    * first read of each path still infers from the real footer, so a
    * regenerated dataset is picked up by a fresh process exactly as
    * before. A LONG-LIVED session that regenerates a dataset at the
    * same path (the events.ts TIMESTAMP-vs-BIGINT variation) must call
    * [[graft.util.GraftSession.releaseCaches]], which clears this memo
    * like every other session cache, so the next read re-infers. */
  private val schemaMemo =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.types.StructType]()

  private[graft] def clearSchemaMemo(): Unit = schemaMemo.clear()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaMemo.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** The engine's internal `events.ts` contract is epoch-NANOS BIGINT.
    * The driver has generated events.parquet with `ts` as either
    * TIMESTAMP(NANOS) (read as long under `nanosAsLong`) or, in later
    * rounds, timestamp[us] (read natively as TIMESTAMP_NTZ) — normalize
    * both to the long-nanos contract here so every downstream plan and
    * its DuckDB oracle (`epoch_us(ts)` / `CAST(ts AS TIMESTAMP)` work
    * on either physical type there) stays schema-agnostic. Row-local,
    * exact: session tz is UTC, so the NTZ→LTZ cast re-interprets
    * losslessly and `unix_micros * 1000` round-trips through
    * `timestamp_micros(ts div 1000)` bit-for-bit. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    =
    normalizeTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
