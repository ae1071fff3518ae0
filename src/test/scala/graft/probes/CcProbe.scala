package graft

import org.apache.spark.sql.functions._

/** Dev probe: canal payload byte distribution at a dir — picks the
  * claim-check spec threshold. Usage: CcProbe <sfDir>. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local(8)
    val cl = cdc.ChangeEvents.changelog(spark, args(0))
    cdc.Sinks.claimCheckFrame(cl, 16, 465).select(col("payload_bytes").as("b"))
      .agg(min(col("b")), expr("percentile(b, 0.25)"), expr("percentile(b, 0.5)"),
        expr("percentile(b, 0.75)"), max(col("b"))).show(false)
    spark.stop()
  }
}
