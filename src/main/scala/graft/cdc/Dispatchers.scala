package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Sink partition dispatchers — the engine's equivalent of TiCDC's
  * eventrouter partition generators (reference:
  * downstreamadapter/sink/helper/eventrouter/partition/{table,
  * index_value, columns, ts}.go).
  *
  * Each dispatcher adds a `partition` column = deterministic bucket in
  * [0, n). Row-local expressions: no shuffle, fully codegen'd. When the
  * downstream write needs co-location, `df.repartition(n, col
  * ("partition"))` aligns Spark partitioning with sink partitioning in
  * one shuffle.
  */
object Dispatchers {
  private val out = Seq("schema_name", "table_name", "pk", "commit_ts", "op")

  /** partition = hash(schema.table) % n — all events of a table land in
    * one partition (reference: partition/table.go). */
  def byTable(cl: DataFrame, n: Int): DataFrame =
    cl.select(out.map(col) :+
      Portable.bucket(concat_ws(".", col("schema_name"), col("table_name")), n).as("partition"): _*)

  def byTableSql(n: Int): String =
    s"""SELECT schema_name, table_name, pk, commit_ts, op,
       |  ${Portable.bucketSql("CONCAT(schema_name, '.', table_name)", n)} AS partition
       |FROM changelog""".stripMargin

  /** The index-value bucket expression — shared by the dispatcher, the
    * kafka message frame, the claim-check frame, and the changefeed
    * facade, with its SQL twin below, so the Spark and oracle sides
    * can never drift apart independently. */
  private[graft] def indexValueBucket(n: Int): org.apache.spark.sql.Column =
    Portable.bucket(
      concat_ws(",", col("schema_name"), col("table_name"), col("pk").cast("string")), n)

  private[graft] def indexValueBucketSql(n: Int): String =
    Portable.bucketSql("CONCAT(schema_name, ',', table_name, ',', CAST(pk AS VARCHAR))", n)

  /** partition = hash(table + pk values) % n — events of one row stay
    * ordered in one partition (reference: partition/index_value.go). */
  def byIndexValue(cl: DataFrame, n: Int): DataFrame =
    cl.select(out.map(col) :+ indexValueBucket(n).as("partition"): _*)

  def byIndexValueSql(n: Int): String =
    s"""SELECT schema_name, table_name, pk, commit_ts, op,
       |  ${indexValueBucketSql(n)} AS partition
       |FROM changelog""".stripMargin

  /** partition = hash(selected payload columns) % n (reference:
    * partition/columns.go). String columns only — engine-portable. */
  def byColumns(cl: DataFrame, columns: Seq[String], n: Int): DataFrame =
    cl.select(out.map(col) :+
      Portable.bucket(concat_ws(",", (Seq("schema_name", "table_name") ++ columns).map(col): _*), n)
        .as("partition"): _*)

  def byColumnsSql(columns: Seq[String], n: Int): String = {
    val cols = (Seq("schema_name", "table_name") ++ columns).mkString(", ',', ")
    s"""SELECT schema_name, table_name, pk, commit_ts, op,
       |  ${Portable.bucketSql(s"CONCAT($cols)", n)} AS partition
       |FROM changelog""".stripMargin
  }

  /** Explicit-key dispatcher (reference: partition/key.go:21): the
    * generator pins the partition index to 0 and stamps the configured
    * key on every message; the producer's key-hash then routes all
    * events of the rule to one stable partition. Row-local constants —
    * zero cost, but 1 of the 5 reference generators. */
  def byKey(cl: DataFrame, key: String): DataFrame =
    cl.select(out.map(col) :+ lit(0L).as("partition") :+ lit(key).as("dispatch_key"): _*)

  def byKeySql(key: String): String =
    s"""SELECT schema_name, table_name, pk, commit_ts, op,
       |  CAST(0 AS BIGINT) AS partition, '$key' AS dispatch_key
       |FROM changelog""".stripMargin

  /** partition = commit_ts % n — round-robin by time (reference:
    * partition/ts.go). */
  def byTs(cl: DataFrame, n: Int): DataFrame =
    cl.select(out.map(col) :+ pmod(col("commit_ts"), lit(n.toLong)).as("partition"): _*)

  def byTsSql(n: Int): String =
    s"""SELECT schema_name, table_name, pk, commit_ts, op,
       |  commit_ts % $n AS partition
       |FROM changelog""".stripMargin
}
