package graft

import org.apache.spark.sql.functions._

/** Dev probe: commit_ts tie census inside the open-wire batch key
  * (schema, table, partition) — the boundary-assignment precondition
  * for A63's boundaries re-plan. Usage: WireTieProbe <sfDir> [n]. */
object WireTieProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 16
    val spark = graft.util.GraftSession.local(16)
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val base = cl.select(col("schema_name"), col("table_name"),
      cdc.Dispatchers.indexValueBucket(n).as("partition"), col("commit_ts"))
    val ties = base.groupBy("schema_name", "table_name", "partition", "commit_ts")
      .count().filter(col("count") > 1)
    println(s"[probe] rows = ${base.count()}")
    println(s"[probe] tied (s,t,p,ts) groups = ${ties.count()}")
    ties.orderBy(desc("count")).show(5, truncate = false)
    spark.stop()
  }
}
