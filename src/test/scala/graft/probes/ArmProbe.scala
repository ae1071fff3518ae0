package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev probe: per-arm projection cost of the TypedImage columns over a
  * changelog (r11 codec-budget attribution). Usage: ArmProbe <sfDir>. */
object ArmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local(32)
    val cl = cdc.ChangeEvents.changelog(spark, args(0)).localCheckpoint()
    println(s"[probe] rows = ${cl.count()}")
    def time(label: String, c: Column): Unit = {
      val t0 = System.nanoTime()
      cl.select(sum(length(c.cast("string")))).head()
      println(f"[probe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    import cdc.TypedImage._
    time("baseline pk", col("pk"))
    time("dateStr", dateStr)
    time("dtStr", dtStr)
    time("decStr", decStr)
    time("bitB64", bitB64)
    time("setName", setName)
    time("binB64", binB64)
    time("timeStr", timeStr)
    time("timeMicros", timeMicros)
    time("yearVal", yearVal)
    time("ubigStr", ubigStr)
    time("ubigWrapped", ubigWrapped)
    time("decPreciseB64", decPreciseB64)
    spark.stop()
  }
}
