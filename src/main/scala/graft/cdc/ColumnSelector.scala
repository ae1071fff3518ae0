package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based sink column selection — the engine's equivalent of
  * TiCDC's column selectors (reference: pkg/common/columnselector/
  * column_selector.go): each rule pairs a table matcher with column
  * patterns; the FIRST rule whose matcher hits the event's table
  * decides which payload columns are encoded, everything else is
  * masked out. No rule matched → all columns pass (the
  * DefaultColumnSelector).
  *
  * In the flat change-event model the payload columns are
  * before_value / after_value / props; matching is static (rules and
  * column names are plan-time constants), so the whole transform
  * compiles to a row-local CASE over the rule index — no UDFs, no
  * shuffle, and an exact SQL oracle.
  */
object ColumnSelector {

  private val payloadCols = Seq("before_value", "after_value", "props")

  private def likeMatch(s: String, pattern: String): Boolean = {
    val rx = ("(?i)^" + java.util.regex.Pattern.quote(pattern)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "$").r
    rx.findFirstIn(s).isDefined
  }

  /** Plan-time column mask for one rule: which payload columns the
    * rule's patterns keep. */
  private def kept(patterns: Seq[String]): Set[String] =
    payloadCols.filter(c => patterns.exists(p => likeMatch(c, p))).toSet

  /** A38 — apply first-match-wins column-selection rules.
    * `rules`: (table LIKE matchers, column wildcard patterns). */
  def select(cl: DataFrame, rules: Seq[(Seq[String], Seq[String])]): DataFrame = {
    val qualified = concat_ws(".", col("schema_name"), col("table_name"))
    val ruleIdx: Column = rules.zipWithIndex.foldRight(lit(-1): Column) {
      case (((matchers, _), i), alt) =>
        when(matchers.map(p => qualified.like(p)).reduce(_ || _), lit(i)).otherwise(alt)
    }
    def masked(name: String): Column = {
      val keepByRule = rules.map { case (_, patterns) => kept(patterns)(name) }
      keepByRule.zipWithIndex.foldRight(col(name)) { case ((keep, i), alt) =>
        when(col("selector_id") === i, if (keep) col(name) else lit(null)).otherwise(alt)
      }.as(name)
    }
    cl.withColumn("selector_id", ruleIdx)
      .select(Seq(col("schema_name"), col("table_name"), col("op"), col("pk"),
        col("commit_ts"), col("selector_id")) ++ payloadCols.map(masked): _*)
  }

  def selectSql(rules: Seq[(Seq[String], Seq[String])]): String = {
    val ruleIdxSql = rules.zipWithIndex.foldRight("-1") {
      case (((matchers, _), i), alt) =>
        s"CASE WHEN ${Filters.tableFilterSql(matchers)} THEN $i ELSE $alt END"
    }
    def maskedSql(name: String): String = {
      val keepByRule = rules.map { case (_, patterns) => kept(patterns)(name) }
      val body = keepByRule.zipWithIndex.foldRight(name) { case ((keep, i), alt) =>
        s"CASE WHEN selector_id = $i THEN ${if (keep) name else "NULL"} ELSE $alt END"
      }
      s"$body AS $name"
    }
    s"""SELECT schema_name, table_name, op, pk, commit_ts, selector_id,
       |  ${payloadCols.map(maskedSql).mkString(",\n  ")}
       |FROM (SELECT *, $ruleIdxSql AS selector_id FROM changelog)""".stripMargin
  }
}
