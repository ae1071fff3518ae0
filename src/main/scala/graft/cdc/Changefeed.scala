package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing changefeed facade — the engine's equivalent of a
  * TiCDC changefeed definition (reference: a changefeed config's
  * filter rules + dispatch rules + sink-uri protocol, applied by
  * downstreamadapter/dispatcher): one declarative config object that
  * composes the filter chain, event router, codec, and sink frame
  * derivation. A user of the reference configures exactly these knobs;
  * this is the single entry point that wires the individual operators
  * (A3–A6, A8–A11, A19–A25, A29–A32) the way the reference's
  * changefeed does.
  *
  * Everything here only composes existing row-local operators, so the
  * whole pipeline stays one scan → one projection chain (plus the
  * sink-specific aggregation where the sink itself aggregates).
  */
object Changefeed {

  sealed trait Protocol
  object Protocol {
    case object CanalJson extends Protocol
    case object OpenProtocol extends Protocol
    case object Debezium extends Protocol
    case object Csv extends Protocol
    case object Avro extends Protocol
    case object Simple extends Protocol
  }

  /** Declarative changefeed definition. Defaults mirror the
    * reference's: match everything, no ignores, index-value dispatch,
    * static default topic, canal-json. */
  case class Config(
      tableRules: Seq[String] = Seq("%.%"),
      ignoreOps: Seq[String] = Nil,
      ignoreTsAtOrBelow: Option[Long] = None,
      ignoreExpr: Option[Column] = None,
      nParts: Int = 16,
      topicRules: Seq[(Seq[String], String)] = Nil,
      defaultTopic: String = "changefeed",
      protocol: Protocol = Protocol.CanalJson,
      safeMode: Boolean = false,
      maxTxnRow: Int = 256)

  /** The filter chain every sink shares (reference: pkg/filter applied
    * before routing). */
  def filtered(cl: DataFrame, cfg: Config): DataFrame = {
    var out = Filters.tableFilter(cl, cfg.tableRules)
    if (cfg.ignoreOps.nonEmpty) out = Filters.eventTypeFilter(out, cfg.ignoreOps)
    cfg.ignoreTsAtOrBelow.foreach(ts => out = Filters.tsFilter(out, ts))
    cfg.ignoreExpr.foreach(e => out = Filters.exprFilter(out, e))
    out
  }

  /** SQL WHERE body matching [[filtered]] for the oracle. */
  def filteredSql(cfg: Config): String = {
    val conds = Seq(Filters.tableFilterSql(cfg.tableRules)) ++
      (if (cfg.ignoreOps.nonEmpty)
        Seq(cfg.ignoreOps.map(o => s"'$o'").mkString("op NOT IN (", ", ", ")"))
      else Nil) ++
      cfg.ignoreTsAtOrBelow.map(ts => s"commit_ts > $ts").toSeq
    conds.mkString("(", ") AND (", ")")
  }

  /** The per-event encoded value for a row-local protocol. */
  private def valueCol(cfg: Config): Column = cfg.protocol match {
    case Protocol.CanalJson    => Codecs.canalJsonValue
    case Protocol.OpenProtocol => Codecs.openProtocolValue
    case Protocol.Debezium     => Codecs.debeziumValue
    case Protocol.Csv          => Codecs.csvLine
    case Protocol.Avro         => Codecs.avroValue
    case Protocol.Simple       => SimpleProtocol.dmlValue
  }

  /** Kafka-sink message frame: filter → route topic (per-table
    * dimension join, the A29 shape) + partition → encode — one scan,
    * one row-local projection plus a ≤tables-row broadcast probe. */
  def kafka(cl: DataFrame, cfg: Config): DataFrame = {
    val routed = Routing.withTopic(filtered(cl, cfg), cl, cfg.topicRules,
      cfg.defaultTopic)
    // the debezium value references the pre-rendered arm columns (the
    // dual-image CSE fix — see Codecs.withDebeziumArms)
    val base = if (cfg.protocol == Protocol.Debezium)
      Codecs.withDebeziumArms(routed) else routed
    base
      .select(
        col("commit_ts"),
        col("topic"),
        Dispatchers.indexValueBucket(cfg.nParts).as("partition"),
        Codecs.openProtocolKey.as("key"),
        valueCol(cfg).as("value"))
  }

  /** DuckDB oracle for [[kafka]] with a debezium-protocol config.
    * `ignoreExpr` is a Catalyst Column and has no SQL rendering here —
    * reject configs that set it rather than emit a wrong oracle. */
  def kafkaDebeziumSql(cfg: Config): String = {
    require(cfg.ignoreExpr.isEmpty, "ignoreExpr has no oracle rendering")
    require(cfg.protocol == Protocol.Debezium,
      s"this oracle renders debezium values; config says ${cfg.protocol}")
    s"""SELECT commit_ts,
       |  ${Routing.topicForSql(cfg.topicRules, cfg.defaultTopic)} AS topic,
       |  ${Dispatchers.indexValueBucketSql(cfg.nParts)} AS partition,
       |  ${Codecs.openProtocolKeySql} AS key,
       |  ${Codecs.debeziumValueSql} AS value
       |FROM changelog
       |WHERE ${filteredSql(cfg)}""".stripMargin
  }

  /** MySQL-sink statement frame: filter → per-txn batched statements. */
  def mysql(cl: DataFrame, cfg: Config): DataFrame =
    Sinks.mysqlStmts(filtered(cl, cfg), cfg.maxTxnRow, cfg.safeMode)

  /** Storage-sink layout frame: filter → partitioned file manifest. */
  def storage(cl: DataFrame, cfg: Config): DataFrame =
    Codecs.storageLayout(filtered(cl, cfg))

  /** Materialized downstream table (blackhole/verification sink). */
  def snapshot(cl: DataFrame, cfg: Config): DataFrame =
    Materialize.snapshot(filtered(cl, cfg))
}
