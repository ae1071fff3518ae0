package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The TiDB column-type matrix for the codecs (round-10 mandate #4).
  *
  * The reference encodes the full MySQL type system — canal
  * `pkg/sink/codec/canal/helper.go:39-260` dispatches per
  * `mysql.Type*` to a (value rendering, java.sql.Types code) pair,
  * avro `pkg/sink/codec/avro/arvo.go:363-430` carries a
  * `type2TiDBType` name map and per-type schema/value rules
  * (:700-975), debezium `pkg/sink/codec/debezium/codec.go:62-430`
  * writes per-type `io.debezium.*` schema names and converted values.
  * Graft's changelog carries a (BIGINT pk, DOUBLE image, JSON props)
  * row, so every codec's dispatch previously ran three arms.
  *
  * This module widens the encoded row image with four deterministic
  * typed columns derived row-locally from columns already on the
  * changelog (no schema change to the changelog itself — the A-row
  * surface is untouched; the codecs project these extensions at
  * encode time):
  *
  *   - `c_date`  DATE      — epoch day commit_ts % 40000 (1970..2079)
  *   - `c_dt`    DATETIME  — epoch second 8e8 + (commit_ts*37) % 1.2e9
  *   - `c_dec`   DECIMAL(20,4) — fixed-point pk*137 + commit_ts % 10^4
  *   - `c_enum`  ENUM('click','error','purchase','signup','view')
  *               — the event-type universe; value = 1-based index
  *
  * plus the existing `props` column formalized as the JSON arm.
  * Every derivation is integer arithmetic + ISO formatting, so the
  * DuckDB oracle renders the identical characters. Per-codec value
  * renderings follow the reference dispatch:
  *
  *   | arm      | canal (helper.go)        | debezium (codec.go)        | avro (arvo.go, string mode) |
  *   |----------|--------------------------|----------------------------|------------------------------|
  *   | DATE     | 'yyyy-MM-dd' string, 91  | int32 epoch days :368-391  | string                       |
  *   | DATETIME | 'yyyy-MM-dd HH:mm:ss',93 | int64 epoch millis :393-421| string                       |
  *   | DECIMAL  | plain string, 3          | double number :349-366     | string (:767 string mode)    |
  *   | ENUM     | index string, 4          | name string :311-328       | name string + allowed (:789) |
  *   | JSON     | raw string, 12           | string (io.debezium.data.Json) | string (:802)            |
  *
  * Documented divergence (the %.4f family): debezium's decimal is a
  * fixed-scale 4-decimal number, not Go's shortest-round-trip float —
  * integer-exact and identical in both engines.
  */
object TypedImage {

  /** ENUM element list (canal/debezium `allowed` parameter order). */
  val enumElems: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val enumAllowed: String = enumElems.mkString(",")

  // ----------------------------------------------------------- DATE
  /** epoch-day number (the debezium int32 wire value) */
  val dateDays: Column = pmod(col("commit_ts"), lit(40000L))
  val dateDaysSql: String = "(commit_ts % 40000)"

  /** ISO 'yyyy-MM-dd' (the canal / avro / csv wire value) */
  val dateStr: Column =
    date_add(lit(java.sql.Date.valueOf("1970-01-01")), dateDays.cast("int"))
      .cast("string")
  val dateStrSql: String =
    s"CAST(DATE '1970-01-01' + CAST($dateDaysSql AS INTEGER) AS VARCHAR)"

  // ------------------------------------------------------- DATETIME
  /** epoch seconds; ×1000 is the debezium millis wire value
    * (precision 0 ≤ 3 → io.debezium.time.Timestamp, codec.go:141-143).
    * commit_ts is reduced before the ×37 so the derivation cannot wrap
    * at ANY input (the OverflowGuard discipline — identical values for
    * commit_ts < 1.2e9, i.e. every driver SF) */
  val dtSec: Column = lit(800000000L) +
    pmod(pmod(col("commit_ts"), lit(1200000000L)) * 37L, lit(1200000000L))
  val dtSecSql: String =
    "(800000000 + ((commit_ts % 1200000000) * 37) % 1200000000)"

  /** 'yyyy-MM-dd HH:mm:ss' (canal / avro / csv wire value; session TZ
    * is UTC in both engines — GraftSession pins it, DuckDB
    * make_timestamp is epoch-naive) */
  val dtStr: Column = date_format(timestamp_seconds(dtSec), "yyyy-MM-dd HH:mm:ss")
  val dtStrSql: String =
    s"strftime(make_timestamp($dtSecSql * 1000000), '%Y-%m-%d %H:%M:%S')"

  // -------------------------------------------------------- DECIMAL
  /** fixed-point ×10⁴ integer (always ≥ 0: pk and commit_ts are);
    * pk reduced first so ×137 cannot wrap at any input */
  val decE4: Column = pmod(col("pk"), lit(1000000000000L)) * 137L +
    pmod(col("commit_ts"), lit(10000L))
  val decE4Sql: String =
    "((pk % 1000000000000) * 137 + commit_ts % 10000)"

  /** plain decimal string 'i.ffff' — canal/avro wire value, and the
    * digits of the debezium number (fixed-scale divergence above) */
  val decStr: Column = concat(
    call_function("div", decE4, lit(10000L)).cast("string"), lit("."),
    lpad(pmod(decE4, lit(10000L)).cast("string"), 4, "0"))
  val decStrSql: String =
    s"CONCAT($decE4Sql // 10000, '.', lpad(CAST($decE4Sql % 10000 AS VARCHAR), 4, '0'))"

  // ----------------------------------------------------------- ENUM
  /** 1-based index into [[enumElems]] (canal integer value;
    * helper.go:115-122 renders 0 as null — the changelog's event-type
    * universe is exactly the element list, so 0 never occurs) */
  val enumIdx: Column = enumElems.zipWithIndex.foldLeft(lit(0L)) {
    case (acc, (e, i)) => when(col("event_type") === e, lit(i + 1L)).otherwise(acc)
  }
  val enumIdxSql: String = enumElems.zipWithIndex
    .map { case (e, i) => s"WHEN '$e' THEN ${i + 1}" }
    .mkString("CASE event_type ", " ", " ELSE 0 END")

  /** element name (debezium/avro wire value, codec.go:311-328) */
  val enumName: Column = col("event_type")
  val enumNameSql: String = "event_type"
}
