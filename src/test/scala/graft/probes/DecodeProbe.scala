package graft

import org.apache.spark.sql.functions._

/** Dev probe: where does codec_simple_decode's sf10 wall go?
  * Stages timed separately in one session (fresh subtree each — the
  * encode window prevents cross-stage reuse):
  *   encode      messages() forced by a value-length sum
  *   schemas     the BOOTSTRAP/DDL filter + parse + distinct leg
  *   parse       full-stream from_json + field extraction, NO join
  *   full        the shipped decode (parse + broadcast schema join)
  * Usage: DecodeProbe <sfDir>. */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.cdc.{ChangeEvents, SimpleProtocol}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)

    val cl = ChangeEvents.fromEvents(
      spark.read.parquet(s"$dir/events.parquet"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("encode")(force(SimpleProtocol.messages(cl)))
      val msgs = SimpleProtocol.messages(cl)
      time("schemas-leg")(
        msgs.filter(col("msg_type").isin("BOOTSTRAP", "DDL")).count())
      time("full-decode")(force(SimpleProtocol.decode(cl)))
    }
    spark.stop()
  }
}
