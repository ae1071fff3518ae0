package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators.
  * Normalization and tokenization must render identically in Spark and
  * the DuckDB oracle, so both sides are defined here side by side.
  */
object Text {

  /** lower → collapse whitespace → trim. */
  def norm(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  def normSql(e: String): String =
    s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  /** whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(norm(c), " ")

  def tokensSql(e: String): String = s"string_split(${normSql(e)}, ' ')"

  /** distinct word 3-grams; empty when < 3 tokens. Spark arrays are
    * 0-based, DuckDB lists 1-based — both renderings below emit the
    * same gram strings. */
  val gramsExpr: String =
    """array_distinct(CASE WHEN size(toks) >= 3
      |  THEN transform(sequence(0, size(toks) - 3),
      |       i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
      |  ELSE array() END)""".stripMargin

  val gramsSql: String =
    """list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1),
      |       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |  ELSE [] END)""".stripMargin
}
