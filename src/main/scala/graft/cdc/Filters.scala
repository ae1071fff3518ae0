package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changefeed filtering — the engine's equivalent of TiCDC's
  * `pkg/filter` (filter.go table matchers, sql_event_filter.go
  * event-type rules, expr_filter.go value predicates).
  *
  * All filters are plain Catalyst predicates, so they participate in
  * predicate pushdown / partition pruning when applied upstream of a
  * scan — at 100 TB these run inside the parquet reader, not after it.
  */
object Filters {

  /** Keep rows whose `schema.table` matches ANY of the SQL-LIKE
    * patterns (TiCDC matcher rules like `["db0.*", "db1.t1"]`;
    * reference: pkg/filter/filter.go). An empty rule list matches
    * everything — the reference's implicit `*.*`. */
  def tableFilter(cl: DataFrame, patterns: Seq[String]): DataFrame =
    if (patterns.isEmpty) cl
    else {
      val qualified = concat_ws(".", col("schema_name"), col("table_name"))
      cl.filter(patterns.map(p => qualified.like(p)).reduce(_ || _))
    }

  def tableFilterSql(patterns: Seq[String]): String =
    if (patterns.isEmpty) "(TRUE)"
    else patterns.map(p => s"CONCAT(schema_name, '.', table_name) LIKE '$p'")
      .mkString("(", " OR ", ")")

  /** Drop events whose op is in `ignore` (TiCDC ignore-event rules:
    * reference pkg/filter/sql_event_filter.go). */
  def eventTypeFilter(cl: DataFrame, ignore: Seq[String]): DataFrame =
    cl.filter(!col("op").isin(ignore: _*))

  /** Drop DML whose row image matches the ignore expression (TiCDC
    * expression filters: reference pkg/filter/expr_filter.go —
    * `shouldSkipDML` skips when the configured predicate matches either
    * image). `ignoreExpr` sees the flat before/after columns. */
  def exprFilter(cl: DataFrame, ignoreExpr: Column): DataFrame =
    cl.filter(!coalesce(ignoreExpr, lit(false)))

  /** Ignore events at or below a resolved/start ts threshold
    * (reference: pkg/filter checkpoint semantics). Range predicate —
    * prunes partitions when the source is ts-partitioned. */
  def tsFilter(cl: DataFrame, minCommitTs: Long): DataFrame =
    cl.filter(col("commit_ts") > minCommitTs)

  /** Rich DDL event filtering (reference: pkg/filter/sql_event_filter.go
    * `newSQLEventFilterRule` + filter.go `ShouldIgnoreDDLEvent`): a rule
    * drops DDL whose type is in the ignore-event taxonomy OR whose query
    * text matches any ignore-SQL regexp. Applied over the DDL frame from
    * [[SchemaStore.ddlEvents]]. Regexps are partial-match in both Spark
    * (`rlike`) and DuckDB (`regexp_matches`) — keep patterns in the
    * common RE dialect. */
  def ddlSqlEventFilter(ddl: DataFrame, ignoreTypes: Seq[String],
                        ignoreSql: Seq[String]): DataFrame = {
    val typePred =
      if (ignoreTypes.isEmpty) lit(false) else col("ddl_type").isin(ignoreTypes: _*)
    val sqlPred = ignoreSql.foldLeft(lit(false): Column)((acc, p) => acc || col("query").rlike(p))
    ddl.filter(!(typePred || sqlPred))
  }

  /** A95 — the FULL table-filter rule semantics of the reference's
    * matcher (pkg/filter/filter.go `tableFilter.ShouldIgnoreTable`,
    * backed by the public tidb-tools table-filter): rules are an
    * ORDERED list, each positive (`db.tbl` pattern) or negative
    * (`!db.tbl`); a table is replicated iff the LAST matching rule is
    * positive; a table matching NO rule is dropped; and when the
    * FIRST rule is negative an implicit accept-all is prepended (so a
    * config of only exclusions means "everything except these").
    * Patterns here are SQL-LIKE (`%`/`_`), the repo's rendering of
    * the matcher wildcards, compared case-insensitively
    * (filter.go's CaseSensitive=false default).
    *
    * Built as a nested last-rule-outermost CASE — a row-local
    * predicate chain that pushes into the scan like every other
    * filter; `decided_by` carries the index (into the EFFECTIVE list,
    * implicit rule = 0) of the deciding rule, -1 = no match, for
    * config auditability. */
  def tableFilterPolarity(cl: DataFrame, rules: Seq[String]): DataFrame = {
    val eff = effectiveRules(rules)
    val q = lower(concat_ws(".", col("schema_name"), col("table_name")))
    val keep = eff.zipWithIndex.foldLeft(lit(false)) {
      case (acc, ((pat, pos), _)) =>
        when(q.like(pat.toLowerCase), lit(pos)).otherwise(acc)
    }
    val decider = eff.zipWithIndex.foldLeft(lit(-1L)) {
      case (acc, ((pat, _), i)) =>
        when(q.like(pat.toLowerCase), lit(i.toLong)).otherwise(acc)
    }
    cl.withColumn("decided_by", decider)
      .filter(keep)
  }

  /** ("pattern", positive?) with the implicit accept-all prepended
    * when the first configured rule is an exclusion. */
  private def effectiveRules(rules: Seq[String]): Seq[(String, Boolean)] = {
    val parsed = rules.map(r =>
      if (r.startsWith("!")) (r.drop(1), false) else (r, true))
    if (parsed.headOption.exists(!_._2)) ("%.%", true) +: parsed else parsed
  }

  def tableFilterPolaritySql(rules: Seq[String]): String = {
    val eff = effectiveRules(rules)
    val q = "LOWER(CONCAT(schema_name, '.', table_name))"
    def esc(p: String) = p.toLowerCase.replace("'", "''")
    val keep = eff.foldLeft("FALSE") { case (acc, (pat, pos)) =>
      s"CASE WHEN $q LIKE '${esc(pat)}' THEN ${if (pos) "TRUE" else "FALSE"} ELSE $acc END"
    }
    val decider = eff.zipWithIndex.foldLeft("CAST(-1 AS BIGINT)") {
      case (acc, ((pat, _), i)) =>
        s"CASE WHEN $q LIKE '${esc(pat)}' THEN CAST($i AS BIGINT) ELSE $acc END"
    }
    s"SELECT *, $decider AS decided_by FROM changelog WHERE $keep"
  }

  def ddlSqlEventFilterSql(ddlFrameSql: String, ignoreTypes: Seq[String],
                           ignoreSql: Seq[String]): String = {
    val typePred =
      if (ignoreTypes.isEmpty) "FALSE"
      else ignoreTypes.map(t => s"'$t'").mkString("ddl_type IN (", ", ", ")")
    val sqlPred = ignoreSql
      .map(p => s"regexp_matches(query, '${p.replace("'", "''")}')")
      .foldLeft("FALSE")((acc, m) => s"$acc OR $m")
    s"""SELECT * FROM (
       |$ddlFrameSql
       |) ddl_frame WHERE NOT ($typePred OR $sqlPred)""".stripMargin
  }
}
