package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The "simple" protocol — the engine's equivalent of TiCDC's
  * new-architecture codec (reference: pkg/sink/codec/simple/message.go
  * `message` struct + encoder.go): a single self-describing message
  * stream carrying BOOTSTRAP (table schema priming), DDL (with table
  * schema before/after), DML (INSERT/UPDATE/DELETE with data/old
  * images and the as-of schemaVersion), and WATERMARK (resolved ts)
  * messages.
  *
  * Divergence from the reference, for determinism: `buildTs` is the
  * message's own commitTs instead of wall-clock time, `tableID` derives
  * from the schema/table ordinals, and bootstrap messages carry
  * commitTs 0. Everything is a row-local codegen'd string expression
  * over the changelog / schema-version frames plus one tiny max()
  * aggregate for the watermark — one union, no joins.
  */
object SimpleProtocol {

  private val version = 1

  /** deterministic tableID: db ordinal × 3 + table ordinal. */
  private val tableId: Column =
    expr("cast(substr(schema_name, 3) as int) * 3 + cast(substr(table_name, 2) as int)")
  private val tableIdSql: String =
    "CAST(SUBSTRING(schema_name, 3) AS INT) * 3 + CAST(SUBSTRING(table_name, 2) AS INT)"

  /** tableSchema JSON for schema version `v` (reference: TableSchema). */
  private def tableSchema(verCol: Column): Column = concat(
    lit("{\"schema\":\""), col("schema_name"),
    lit("\",\"table\":\""), col("table_name"),
    lit("\",\"version\":"), verCol,
    lit(",\"columns\":[{\"name\":\"pk\",\"dataType\":\"BIGINT\",\"nullable\":false}," +
      "{\"name\":\"value\",\"dataType\":\"DOUBLE\",\"nullable\":true}," +
      "{\"name\":\"props\",\"dataType\":\"JSON\",\"nullable\":true}]}"))

  private def tableSchemaSql(verExpr: String): String =
    s"""CONCAT('{"schema":"', schema_name,
       |  '","table":"', table_name,
       |  '","version":', $verExpr,
       |  ',"columns":[{"name":"pk","dataType":"BIGINT","nullable":false},',
       |  '{"name":"value","dataType":"DOUBLE","nullable":true},',
       |  '{"name":"props","dataType":"JSON","nullable":true}]}')""".stripMargin

  /** DML message value — row-local; reused by the Changefeed facade. */
  private[cdc] def dmlValue: Column = {
    val dmlType = when(col("op") === "I", lit("INSERT"))
      .when(col("op") === "D", lit("DELETE")).otherwise(lit("UPDATE"))
    val image = concat(lit("{\"pk\":"), col("pk"),
      lit(",\"value\":"), Codecs.fmt(col("after_value")),
      lit(",\"props\":"), col("props"), lit("}"))
    val old = concat(lit("{\"pk\":"), col("pk"),
      lit(",\"value\":"), Codecs.fmt(col("before_value")), lit("}"))
    concat(
      lit(s"""{"version":$version,"database":""""), col("schema_name"),
      lit("\",\"table\":\""), col("table_name"),
      lit("\",\"tableID\":"), tableId,
      lit(",\"type\":\""), dmlType,
      lit("\",\"commitTs\":"), col("commit_ts"),
      lit(",\"buildTs\":"), col("commit_ts"),
      lit(",\"schemaVersion\":"), expr(s"commit_ts div ${SchemaStore.step}"),
      when(col("op") =!= "D", concat(lit(",\"data\":"), image)).otherwise(lit("")),
      when(col("op") =!= "I", concat(lit(",\"old\":"), old)).otherwise(lit("")),
      lit("}"))
  }

  /** A34 — the full simple-protocol message stream over a changelog. */
  def messages(cl: DataFrame): DataFrame = {
    val dml = cl.select(col("commit_ts"), lit("DML").as("msg_type"),
      dmlValue.as("value"))

    val ddlFrame = SchemaStore.ddlEvents(cl, Nil)
    val ddl = ddlFrame.select(col("valid_from").as("commit_ts"),
      lit("DDL").as("msg_type"), concat(
        lit(s"""{"version":$version,"database":""""), col("schema_name"),
        lit("\",\"table\":\""), col("table_name"),
        lit("\",\"tableID\":"), tableId,
        lit(",\"type\":\""), col("ddl_type"),
        lit("\",\"sql\":\""), col("query"),
        lit("\",\"commitTs\":"), col("valid_from"),
        lit(",\"buildTs\":"), col("valid_from"),
        lit(",\"tableSchema\":"),
        tableSchema(expr(s"valid_from div ${SchemaStore.step}")),
        lit("}")).as("value"))

    val bootstrap = cl.select(col("schema_name"), col("table_name")).distinct()
      .select(lit(0L).as("commit_ts"), lit("BOOTSTRAP").as("msg_type"), concat(
        lit(s"""{"version":$version,"type":"BOOTSTRAP","commitTs":0,"buildTs":0,"tableSchema":"""),
        tableSchema(lit(0)), lit("}")).as("value"))

    val watermark = cl.agg(max(col("commit_ts")).as("rts"))
      .select(col("rts").as("commit_ts"), lit("WATERMARK").as("msg_type"), concat(
        lit(s"""{"version":$version,"type":"WATERMARK","commitTs":"""), col("rts"),
        lit(",\"buildTs\":"), col("rts"), lit("}")).as("value"))

    bootstrap.unionAll(ddl).unionAll(dml).unionAll(watermark)
  }

  def messagesSql: String = {
    val dmlTypeSql = "CASE op WHEN 'I' THEN 'INSERT' WHEN 'D' THEN 'DELETE' ELSE 'UPDATE' END"
    val imageSql =
      s"""CONCAT('{"pk":', pk, ',"value":', ${Codecs.fmtSql("after_value")}, ',"props":', props, '}')"""
    val oldSql =
      s"""CONCAT('{"pk":', pk, ',"value":', ${Codecs.fmtSql("before_value")}, '}')"""
    s"""SELECT CAST(0 AS BIGINT) AS commit_ts, 'BOOTSTRAP' AS msg_type,
       |  CONCAT('{"version":$version,"type":"BOOTSTRAP","commitTs":0,"buildTs":0,"tableSchema":',
       |    ${tableSchemaSql("0")}, '}') AS value
       |FROM (SELECT DISTINCT schema_name, table_name FROM changelog)
       |UNION ALL
       |SELECT valid_from AS commit_ts, 'DDL' AS msg_type,
       |  CONCAT('{"version":$version,"database":"', schema_name,
       |    '","table":"', table_name,
       |    '","tableID":', $tableIdSql,
       |    ',"type":"', ddl_type,
       |    '","sql":"', query,
       |    '","commitTs":', valid_from,
       |    ',"buildTs":', valid_from,
       |    ',"tableSchema":', ${tableSchemaSql(s"valid_from // ${SchemaStore.step}")},
       |    '}') AS value
       |FROM (${SchemaStore.ddlEventsSql(Nil)}) ddl_frame
       |UNION ALL
       |SELECT commit_ts, 'DML' AS msg_type,
       |  CONCAT('{"version":$version,"database":"', schema_name,
       |    '","table":"', table_name,
       |    '","tableID":', $tableIdSql,
       |    ',"type":"', $dmlTypeSql,
       |    '","commitTs":', commit_ts,
       |    ',"buildTs":', commit_ts,
       |    ',"schemaVersion":', commit_ts // ${SchemaStore.step},
       |    CASE WHEN op <> 'D' THEN CONCAT(',"data":', $imageSql) ELSE '' END,
       |    CASE WHEN op <> 'I' THEN CONCAT(',"old":', $oldSql) ELSE '' END,
       |    '}') AS value
       |FROM changelog
       |UNION ALL
       |SELECT MAX(commit_ts) AS commit_ts, 'WATERMARK' AS msg_type,
       |  CONCAT('{"version":$version,"type":"WATERMARK","commitTs":', MAX(commit_ts),
       |    ',"buildTs":', MAX(commit_ts), '}') AS value
       |FROM changelog""".stripMargin
  }
}
