package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros, lit}
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
