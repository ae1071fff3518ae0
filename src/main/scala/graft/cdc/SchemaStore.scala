package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** Versioned schema store — the engine's equivalent of TiCDC's
  * `logservice/schemastore`: every DML is decoded against the table
  * schema *as of its commitTs* (`getTableInfo(ts)`), and DDL events
  * flow through the changefeed (filtered by pkg/filter/ddl.go rules).
  *
  * Schema versions are derived deterministically from the changelog
  * (a new version every `step` commit timestamps) so the DuckDB oracle
  * can reproduce them and check the as-of semantics with a native
  * ASOF JOIN.
  */
object SchemaStore {
  val step = 1000L

  /** Deterministic version table: (schema, table, valid_from, schema_ver). */
  def schemaVersions(cl: DataFrame): DataFrame = {
    val tables = cl.select(col("schema_name"), col("table_name")).distinct()
    val vs = cl.agg(max(col("commit_ts")).as("m"))
      .select(explode(sequence(lit(0L), expr(s"m div $step"), lit(1L))).as("v"))
    tables.crossJoin(broadcast(vs))
      .select(col("schema_name"), col("table_name"),
        (col("v") * step).as("valid_from"),
        concat(lit("v"), col("v").cast("string")).as("schema_ver"))
  }

  val schemaVersionsSql: String =
    s"""SELECT t.schema_name, t.table_name,
       |  g.v * $step AS valid_from,
       |  CONCAT('v', CAST(g.v AS VARCHAR)) AS schema_ver
       |FROM (SELECT DISTINCT schema_name, table_name FROM changelog) t
       |CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, (SELECT MAX(commit_ts) FROM changelog) // $step)) AS v) g""".stripMargin

  /** A17: resolve each event against its as-of schema version. */
  def eventsWithSchema(cl: DataFrame): DataFrame = {
    val versions = schemaVersions(cl)
    AsOf.joinAsOf(
      cl.select(col("schema_name"), col("table_name"), col("pk"),
        col("commit_ts"), col("op")),
      versions,
      keys = Seq("schema_name", "table_name"),
      leftTs = "commit_ts", rightTs = "valid_from",
      payload = Seq("schema_ver"))
  }

  val eventsWithSchemaSql: String =
    s"""WITH versions AS ($schemaVersionsSql)
       |SELECT c.schema_name, c.table_name, c.pk, c.commit_ts, c.op, v.schema_ver
       |FROM changelog c
       |ASOF JOIN versions v
       |  ON c.schema_name = v.schema_name
       | AND c.table_name = v.table_name
       | AND c.commit_ts >= v.valid_from""".stripMargin

  /** A18: the DDL event stream implied by the version table — CREATE at
    * v0, ALTER at later versions — with a DDL-type filter applied
    * (reference: pkg/filter/ddl.go ignore rules). */
  def ddlEvents(cl: DataFrame, ignoreTypes: Seq[String]): DataFrame =
    schemaVersions(cl)
      .withColumn("ddl_type",
        when(col("valid_from") === 0L, lit("CREATE")).otherwise(lit("ALTER")))
      .withColumn("query",
        when(col("ddl_type") === "CREATE",
          concat(lit("CREATE TABLE "), col("schema_name"), lit("."), col("table_name"),
            lit(" (pk BIGINT PRIMARY KEY, value DOUBLE, props JSON)")))
        .otherwise(
          concat(lit("ALTER TABLE "), col("schema_name"), lit("."), col("table_name"),
            lit(" ADD COLUMN "), col("schema_ver"), lit(" BIGINT"))))
      .filter(!col("ddl_type").isin(ignoreTypes: _*))
      .select("schema_name", "table_name", "valid_from", "schema_ver", "ddl_type", "query")

  def ddlEventsSql(ignoreTypes: Seq[String]): String = {
    val ignoreList = ignoreTypes.map(t => s"'$t'").mkString(", ")
    val ignoreClause = if (ignoreTypes.isEmpty) "" else s"WHERE ddl_type NOT IN ($ignoreList)"
    s"""WITH versions AS ($schemaVersionsSql),
       |ddl AS (
       |  SELECT schema_name, table_name, valid_from, schema_ver,
       |    CASE WHEN valid_from = 0 THEN 'CREATE' ELSE 'ALTER' END AS ddl_type
       |  FROM versions
       |)
       |SELECT schema_name, table_name, valid_from, schema_ver, ddl_type,
       |  CASE WHEN ddl_type = 'CREATE'
       |    THEN CONCAT('CREATE TABLE ', schema_name, '.', table_name,
       |                ' (pk BIGINT PRIMARY KEY, value DOUBLE, props JSON)')
       |    ELSE CONCAT('ALTER TABLE ', schema_name, '.', table_name,
       |                ' ADD COLUMN ', schema_ver, ' BIGINT')
       |  END AS query
       |FROM ddl $ignoreClause""".stripMargin
  }
}
