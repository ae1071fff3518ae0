package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE money-output convention, in one place: every oracle-checked
  * money aggregate surfaces as exact integer minor units (cents) in a
  * BIGINT column — never decimal, never double.
  *
  * Rationale, learned over three driver rounds:
  *  - round 1-2 emitted `round(double, 2)` → the verification
  *    environment hash-diverged at ULP level;
  *  - round 3 emitted decimal(18,2) derived from exact cents → worse:
  *    the environment renders Spark's parquet decimal scale-preserving
  *    ("12.30") but DuckDB's decimal via float ("12.3"), so every
  *    query with a trailing-zero-cent value hash-failed even though
  *    the values were bitwise-identical under local DuckDB;
  *  - BIGINT and VARCHAR columns have never hash-flaked in any round
  *    across all 44 CDC-series operators.
  * A cents BIGINT has a unique byte encoding in every engine — there
  * is nothing left for a driver to canonicalize.
  *
  * The per-row extraction `round(x*100.0)` is exact for true-2-decimal
  * money values, and the long sum is exact and merge-order-independent
  * (pure primitive codegen with map-side combine; ANSI mode faults
  * loudly beyond 2^63 minor units — groups that large need
  * decimal(38,0) sums).
  *
  * The DuckDB rendering of each step lives next to its user:
  * `CAST(SUM(CAST(ROUND(x*100.0,0) AS BIGINT)) AS BIGINT)` — the outer
  * cast matters: DuckDB types SUM-of-integer as HUGEINT(int128), which
  * its pandas bridge coerces to float64, the other verified
  * hash-divergence class (int64 3 vs float64 3.0).
  *
  * Analytics.moneyCents extends the same scheme to money *products*
  * with more true decimals (revenue terms).
  */
object Money {

  /** Exact per-row cents of a true-2-decimal money column. */
  def cents(c: Column): Column = round(c * lit(100.0)).cast("long")

  /** Order-independent exact cents sum of a money column (BIGINT). */
  def sumCents(c: Column): Column = sum(cents(c))
}
