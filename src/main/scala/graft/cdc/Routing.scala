package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Topic routing — the engine's equivalent of TiCDC's eventrouter topic
  * generators (reference: downstreamadapter/sink/helper/eventrouter/
  * event_router.go:78 `GetTopicForRowChange` + topic/expression.go:52
  * `Substitute` + topic/topic.go static/dynamic generators).
  *
  * A topic expression has the form `[prefix]{schema}[middle][{table}]
  * [suffix]`. Substitution sanitizes schema/table (any char outside
  * `[A-Za-z0-9._-]` becomes `_`), expands the placeholders, truncates to
  * the 249-char Kafka limit, and maps the degenerate names `.`/`..` to
  * `_`/`__`. An empty rule is the static generator: every event goes to
  * the changefeed's default topic.
  *
  * Everything here is a row-local codegen'd string expression — no
  * shuffle, scales linearly — with a character-identical DuckDB
  * rendering for the oracle.
  */
object Routing {

  private val forbidden = "[^A-Za-z0-9._-]"

  /** Template split into literal / {schema} / {table} segments. */
  private def segments(template: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var rest = template
    while (rest.nonEmpty) {
      val i = rest.indexOf('{')
      if (i < 0) { out += rest; rest = "" }
      else {
        if (i > 0) { out += rest.substring(0, i); rest = rest.substring(i) }
        if (rest.startsWith("{schema}")) { out += "{schema}"; rest = rest.drop(8) }
        else if (rest.startsWith("{table}")) { out += "{table}"; rest = rest.drop(7) }
        else { out += "{"; rest = rest.drop(1) }
      }
    }
    out.result()
  }

  /** Compile one topic expression to a Column over the changelog frame. */
  def topicExpr(template: String): Column = {
    val parts = segments(template).map {
      case "{schema}" => regexp_replace(col("schema_name"), forbidden, "_")
      case "{table}"  => regexp_replace(col("table_name"), forbidden, "_")
      case s          => lit(s)
    }
    val t = substring(concat(parts: _*), 1, 249)
    when(t === lit("."), lit("_")).when(t === lit(".."), lit("__")).otherwise(t)
  }

  /** DuckDB rendering of [[topicExpr]]. */
  def topicExprSql(template: String): String = {
    val parts = segments(template).map {
      case "{schema}" => s"regexp_replace(schema_name, '$forbidden', '_', 'g')"
      case "{table}"  => s"regexp_replace(table_name, '$forbidden', '_', 'g')"
      case s          => s"'${s.replace("'", "''")}'"
    }
    val cat = s"substring(${parts.mkString("CONCAT(", ", ", ")")}, 1, 249)"
    s"(CASE WHEN $cat = '.' THEN '_' WHEN $cat = '..' THEN '__' ELSE $cat END)"
  }

  /** First-match-wins routing rules (reference: event_router.go:40
    * `NewEventRouter` — each rule is a table matcher + topic expression;
    * the implicit trailing `*.*` rule is the static default topic).
    * A rule's empty template means "static default topic" too. */
  def topicFor(rules: Seq[(Seq[String], String)], defaultTopic: String): Column =
    rules.foldRight(lit(defaultTopic): Column) { case ((patterns, template), alt) =>
      val qualified = concat_ws(".", col("schema_name"), col("table_name"))
      val matches = patterns.map(p => qualified.like(p)).reduce(_ || _)
      val topic = if (template.isEmpty) lit(defaultTopic) else topicExpr(template)
      when(matches, topic).otherwise(alt)
    }

  def topicForSql(rules: Seq[(Seq[String], String)], defaultTopic: String): String = {
    val dflt = s"'${defaultTopic.replace("'", "''")}'"
    rules.foldRight(dflt) { case ((patterns, template), alt) =>
      val matches = Filters.tableFilterSql(patterns)
      val topic = if (template.isEmpty) dflt else topicExprSql(template)
      s"(CASE WHEN $matches THEN $topic ELSE $alt END)"
    }
  }

  /** A29 — per-event topic routing frame: every row-change resolved to
    * its target topic through the rule chain. */
  def route(cl: DataFrame, rules: Seq[(Seq[String], String)], defaultTopic: String): DataFrame =
    cl.select(col("schema_name"), col("table_name"), col("commit_ts"), col("op"),
      topicFor(rules, defaultTopic).as("topic"))

  def routeSql(rules: Seq[(Seq[String], String)], defaultTopic: String): String =
    s"""SELECT schema_name, table_name, commit_ts, op,
       |  ${topicForSql(rules, defaultTopic)} AS topic
       |FROM changelog""".stripMargin
}
