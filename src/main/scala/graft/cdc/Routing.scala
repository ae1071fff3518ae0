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

  /** The per-TABLE topic dimension: the rule-match + sanitize chain
    * resolved once per distinct (schema, table) — the reference's own
    * shape (event_router.go caches the generated topic per table, it
    * never re-substitutes per event). Events then pick their topic by
    * a broadcast hash join on the table identity, so the per-row cost
    * is one hash probe instead of the full regex chain. */
  private def topicDim(cl: DataFrame, rules: Seq[(Seq[String], String)],
                       defaultTopic: String): DataFrame =
    ClDims.tables(cl)
      .withColumn("topic", topicFor(rules, defaultTopic))

  /** Attach the routed `topic` column to any changelog-shaped frame by
    * the per-table dimension join. Streaming frames keep the row-local
    * chain (no checkpointable dimension; micro-batches are bounded). */
  def withTopic(df: DataFrame, cl: DataFrame,
                rules: Seq[(Seq[String], String)],
                defaultTopic: String): DataFrame =
    if (df.isStreaming)
      df.withColumn("topic", topicFor(rules, defaultTopic))
    else
      df.join(broadcast(topicDim(cl, rules, defaultTopic)),
        Seq("schema_name", "table_name"))

  /** A29 — per-event topic routing frame: every row-change resolved to
    * its target topic through the rule chain (per-table dimension join;
    * the distinct is a map-side-combined two-column pass). */
  def route(cl: DataFrame, rules: Seq[(Seq[String], String)], defaultTopic: String): DataFrame =
    cl.select(col("schema_name"), col("table_name"), col("commit_ts"), col("op"))
      .join(broadcast(topicDim(cl, rules, defaultTopic)),
        Seq("schema_name", "table_name"))
      .select(col("schema_name"), col("table_name"), col("commit_ts"),
        col("op"), col("topic"))

  def routeSql(rules: Seq[(Seq[String], String)], defaultTopic: String): String =
    s"""SELECT schema_name, table_name, commit_ts, op,
       |  ${topicForSql(rules, defaultTopic)} AS topic
       |FROM changelog""".stripMargin

  /** A66 — DDL/checkpoint partition dispatch (reference:
    * downstreamadapter/worker/kafka_ddl_worker.go:54-68
    * getDDLDispatchRule + :140-160 and :180-215): non-DML kafka
    * messages have their OWN partition rule, separate from the row
    * dispatchers — a DDL message goes to partition 0 under canal /
    * canal-json (consumers there require global DDL order) and is
    * BROADCAST to every partition under any other protocol
    * (SyncBroadcastMessage); a checkpoint ts is broadcast to every
    * partition of every ACTIVE topic (the topics the replicated
    * tables route to — the default topic only when there are none).
    * One delivery row per (message, topic, partition).
    *
    * Scale shape: the DDL leg is the tiny A18 stream × ≤n fan-out;
    * the active-topic set is a distinct over the routed table list —
    * both trivial next to the row traffic they coordinate. */
  def ddlRouting(cl: DataFrame, rules: Seq[(Seq[String], String)],
                 defaultTopic: String, protocol: String, n: Int): DataFrame = {
    val broadcastAll = protocol != "canal" && protocol != "canal-json"
    val ddlParts =
      if (broadcastAll) sequence(lit(0L), lit(n.toLong - 1L))
      else array(lit(0L))
    // The DDL grid (tables × versions) falls out of a dimension-side
    // aggregate in ~1 partition; spread it before the ×nParts explode
    // and the topic/query string work or the whole fan-out runs on one
    // task (17.5 s -> 1.9 s at the sf10 tier).
    val ddl = SchemaStore.ddlEvents(cl, Nil)
      .repartition(cl.sparkSession.sparkContext.defaultParallelism)
      .select(lit("DDL").as("msg_kind"), col("valid_from").as("commit_ts"),
        col("schema_name"), col("table_name"),
        topicFor(rules, defaultTopic).as("topic"),
        explode(ddlParts).as("partition"))
    // distinct tables FIRST, then the rule chain over the dimension
    // frame — not the chain over every event and a distinct after
    val activeTopics = topicDim(cl, rules, defaultTopic)
      .select(col("topic")).distinct()
    val ckpt = ClDims.maxTs(cl).select(col("m").as("rts"))
      .crossJoin(activeTopics)
      .select(lit("CHECKPOINT").as("msg_kind"), col("rts").as("commit_ts"),
        lit(null).cast("string").as("schema_name"),
        lit(null).cast("string").as("table_name"),
        col("topic"),
        explode(sequence(lit(0L), lit(n.toLong - 1L))).as("partition"))
    ddl.unionByName(ckpt)
  }

  def ddlRoutingSql(rules: Seq[(Seq[String], String)], defaultTopic: String,
                    protocol: String, n: Int): String = {
    val broadcastAll = protocol != "canal" && protocol != "canal-json"
    val ddlPartsRange = if (broadcastAll) s"range(0, $n)" else "range(0, 1)"
    s"""SELECT 'DDL' AS msg_kind, valid_from AS commit_ts,
       |  schema_name, table_name,
       |  ${topicForSql(rules, defaultTopic)} AS topic,
       |  CAST(p.part AS BIGINT) AS partition
       |FROM (${SchemaStore.ddlEventsSql(Nil)}) ddl_frame
       |CROSS JOIN (SELECT UNNEST($ddlPartsRange) AS part) p
       |UNION ALL
       |SELECT 'CHECKPOINT' AS msg_kind, r.rts AS commit_ts,
       |  NULL AS schema_name, NULL AS table_name,
       |  t.topic, CAST(p.part AS BIGINT) AS partition
       |FROM (SELECT MAX(commit_ts) AS rts FROM changelog) r
       |CROSS JOIN (SELECT DISTINCT ${topicForSql(rules, defaultTopic)} AS topic
       |            FROM changelog) t
       |CROSS JOIN (SELECT UNNEST(range(0, $n)) AS part) p""".stripMargin
  }
}
