package graft

import org.apache.spark.sql.functions._

/** Dev probe: changefeed_pipeline stage timing (r11 regression hunt).
  * Usage: CfProbe <sfDir>. */
object CfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.GraftSession.local(32)
    val cfg = SparkEntry.probeChangefeedCfg
    val clF = cdc.ChangeEvents.changelog(spark, dir)
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    for (pass <- 1 to 2) {
      println(s"[probe] --- pass $pass")
      time("filtered only")(force(cdc.Changefeed.filtered(clF, cfg)))
      time("codec_debezium ref")(force(cdc.Codecs.debezium(clF)))
      time("debezium of filtered")(force(
        cdc.Codecs.debezium(cdc.Changefeed.filtered(clF, cfg))))
      time("full kafka()")(force(cdc.Changefeed.kafka(clF, cfg)))
      time("kafka sans value")(force(
        cdc.Changefeed.kafka(clF, cfg).drop("value")))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      time("full kafka() no-WSCG")(force(cdc.Changefeed.kafka(clF, cfg)))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
      time("full kafka() huge=8k")(force(cdc.Changefeed.kafka(clF, cfg)))
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
    }
    spark.stop()
  }
}
