package graft

import org.apache.spark.sql.functions._

/** Dev probe: A/B the two cdc_event_seq_check physical plans (mono
  * per-dispatcher window vs two-level chunked prefix) at any SF —
  * the r10 mandate-#2 reconciliation. Each arm runs `passes` times
  * cold-ish (fresh count per pass); reports every pass and the min.
  * Usage: SeqAbProbe <sfDir> [passes]. */
object SeqAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.util.GraftSession.local(32)
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val b0 = cdc.ClDims.tsCensus(cl).head()
    val (lo, hi, n) = (b0.getLong(0), b0.getLong(1), b0.getLong(2))
    println(s"[probe] rows=$n tsLo=$lo tsHi=$hi")

    def run(label: String, mk: () => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk().agg(count(lit(1)), sum(hash(col("*")).cast("long"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-10s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f s")
      times.min
    }
    val mono = run("mono", () =>
      cdc.EventService.seqCheckItems(cdc.EventService.seqCheckMono(cl)))
    val chunked = run("chunked", () =>
      cdc.EventService.seqCheckItems(cdc.EventService.seqCheckChunked(cl, lo, hi)))
    println(f"[probe] winner = ${if (mono <= chunked) "mono" else "chunked"} " +
      f"(mono=$mono%.2f chunked=$chunked%.2f)")
    spark.stop()
  }
}
