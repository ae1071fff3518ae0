package graft

import org.apache.spark.sql.functions._

/** Dev probe: attribute the r14 dedup_containment regression (sf0.1
  * 2.88 -> 7.31 s; sole candidate commit changed pruneGate's
  * approx_count_distinct rsd from the ~5% default to 0.005).
  * Two candidate mechanisms from the r14 verdict:
  *   (a) the 0.5%-rsd HLL sketch makes the gate agg itself expensive;
  *   (b) the more accurate estimate FLIPS the plan arm for the bench
  *       corpus (r13's measured prune-off was 3.23 s, so a flip alone
  *       under-explains 7.3).
  * Measures: gate agg alone at rsd {0.005, 0.02, default} and exact
  * countDistinct (x3 each), the decision each arm draws, then the full
  * C42 wall with prune forced on / forced off / auto.
  * Usage: GateProbe <sfDir>. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.GraftSession.local(32)
    import ops.{Dedup, Retrieval}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    time("gram cache build")(Dedup.gramFrame(spark, dir).count())
    val fps = Retrieval.winnowHashesCached(spark, dir, 4)
    val n = time("winnow fps build")(fps.count())
    println(s"[probe] fps rows = $n")

    val fpsS = fps.select(col("doc_id"), col("fp_hash"))
    def gate(rsd: Double): (Double, Double) = {
      val r = fpsS.agg(count(lit(1)).cast("double").as("n"),
        approx_count_distinct(col("fp_hash"), rsd).cast("double").as("d")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    def gateExact(): (Double, Double) = {
      val r = fpsS.agg(count(lit(1)).cast("double").as("n"),
        countDistinct(col("fp_hash")).cast("double").as("d")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    for (pass <- 1 to 3) {
      val (n5, d5) = time(s"gate rsd=0.005 (pass $pass)")(gate(0.005))
      val (n2, d2) = time(s"gate rsd=0.02  (pass $pass)")(gate(0.02))
      val (nd, dd) = time(s"gate rsd=0.05  (pass $pass)")(gate(0.05))
      val (nx, dx) = time(s"gate exact     (pass $pass)")(gateExact())
      if (pass == 1) {
        def frac(n: Double, d: Double) = 1.0 - d / n
        println(f"[probe] sharedFrac rsd=.005 ${frac(n5, d5)}%.5f  " +
          f"rsd=.02 ${frac(n2, d2)}%.5f  rsd=.05 ${frac(nd, dd)}%.5f  " +
          f"exact ${frac(nx, dx)}%.5f  (threshold 0.05)")
        println(s"[probe] decision(prune on?): rsd=.005 ${frac(n5, d5) < 0.05} " +
          s"rsd=.02 ${frac(n2, d2) < 0.05} rsd=.05 ${frac(nd, dd) < 0.05} " +
          s"exact ${frac(nx, dx) < 0.05}")
      }
    }

    val g = Dedup.gramFrame(spark, dir)
    def full(prune: Option[Boolean], label: String): Unit = {
      val t0 = System.nanoTime()
      val c = Retrieval.containmentFromFps(fps, g, 800000L, prune = prune).count()
      println(f"[probe] full C42 $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$c")
    }
    full(Some(true), "prune=ON  (1st)")
    full(Some(false), "prune=OFF (1st)")
    full(None, "auto      (1st)")
    full(Some(true), "prune=ON  (2nd)")
    full(Some(false), "prune=OFF (2nd)")
    full(None, "auto      (2nd)")
    spark.stop()
  }
}
