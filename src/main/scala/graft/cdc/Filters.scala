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
