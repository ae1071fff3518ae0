package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE money-output convention, in one place: every oracle-checked
  * money aggregate goes through exact integer cents and surfaces as a
  * decimal(18,2) column. Rationale (learned from a 2-round driver
  * hash-divergence): ROUND-over-double differs at ULP level across
  * engine builds, but (a) per-row cents extraction is exact for
  * true-2-decimal values, (b) long sums are exact and
  * merge-order-independent, and (c) the final cents→decimal conversion
  * only touches values exactly ON the cent grid (lossless for
  * |cents| < 2^53), so the output bytes are identical under any
  * engine/driver version. The DuckDB rendering of each step lives next
  * to its user (`SUM(CAST(ROUND(x*100.0,0) AS BIGINT))` /
  * `CAST(cents/100.0 AS DECIMAL(18,2))`).
  *
  * Analytics.dmoney extends the same scheme to money *products* with
  * more true decimals (revenue terms); it shares [[centsToDecimal]].
  */
object Money {

  /** Exact per-row cents of a true-2-decimal money column. */
  def cents(c: Column): Column = round(c * lit(100.0)).cast("long")

  /** A cent-grid long → decimal(18,2), byte-stable in any engine. */
  def centsToDecimal(centsCol: Column): Column =
    (centsCol / lit(100.0)).cast("decimal(18,2)")

  /** Order-independent exact decimal(18,2) sum of a money column. */
  def sumDecimal(c: Column): Column = centsToDecimal(sum(cents(c)))
}
