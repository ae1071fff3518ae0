package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe main for the approximate-percentile variants of B13
  * (q_approx_quantile) and C23 (corpus_stats): runs the EXACT and the
  * `approx_percentile` paths side by side, times both, and asserts the
  * sketch's rank-error contract — for every (group, p) the returned
  * value's rank interval [cnt_lt/n, cnt_le/n] must overlap
  * [p − 1/accuracy, p + 1/accuracy]. Prints ONE JSON line; exits 1 if
  * any group violates the bound (so tools/scaleprobe.py can gate on
  * it). The approx path is the swap §6 documents for 100 TB: a bounded
  * mergeable sketch per group instead of buffering every value. */
object ApproxProbe {

  /** max rank error in ppm across (group, percentile) cells: how far
    * outside [p−ε, p+ε] the approx value's true rank interval sits. */
  private def maxRankErrPpm(src: DataFrame, approx: DataFrame): Long = {
    // approx: (g, p, av); src: (g, v)
    val j = src.join(approx, Seq("g"))
      .groupBy(col("g"), col("p"), col("av"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("av"), 1L).otherwise(0L)).as("cnt_lt"),
        sum(when(col("v") <= col("av"), 1L).otherwise(0L)).as("cnt_le"))
      .select(greatest(lit(0.0),
        col("cnt_lt") / col("n") - col("p"),
        col("p") - col("cnt_le") / col("n")).as("err"))
    val r = j.agg(coalesce(max(col("err")), lit(0.0))).head().getDouble(0)
    math.round(r * 1e6)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val accuracy = sys.env.getOrElse("SPARK_GRAFT_APPROX_ACCURACY", "10000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boundPpm = math.round(1e6 / accuracy)

    def probe(name: String, exact: => DataFrame, approx: => DataFrame,
              src: DataFrame, pCols: Seq[(String, Double)],
              keyCols: Seq[String]): String = {
      val (exactRows, exactSec) = timed(exact.collect())
      val (approxDf, approxSec) = {
        val (df, s) = timed { val d = approx.localCheckpoint(); d.count(); d }
        (df, s)
      }
      // unpivot the ×10⁴ percentile columns back to (g, p, av) points
      val g = concat_ws("/", keyCols.map(col): _*)
      val points = pCols.map { case (c, p) =>
        approxDf.select(g.as("g"), lit(p).as("p"),
          (col(c) / lit(10000.0)).as("av"))
      }.reduce(_ unionAll _)
      val errPpm = maxRankErrPpm(src, points)
      System.err.println(f"[approx] $name%-18s exact ${exactSec}%6.2f s  " +
        f"approx ${approxSec}%6.2f s  rank_err ${errPpm}%d ppm (bound $boundPpm)")
      s""""$name":{"groups":${exactRows.length},"exact_sec":${f3(exactSec)},""" +
        s""""approx_sec":${f3(approxSec)},"max_rank_err_ppm":$errPpm,""" +
        s""""bound_ppm":$boundPpm,"ok":${errPpm <= boundPpm}}"""
    }

    val li = graft.util.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
    val b13 = probe("q_approx_quantile",
      queries.Analytics.qApproxQuantile(spark, sfDir),
      queries.Analytics.qApproxQuantileApprox(spark, sfDir, accuracy),
      li, Seq("p50_x10k" -> 0.5, "p95_x10k" -> 0.95), Seq("l_returnflag"))

    val docs = graft.util.Tables.documents(spark, sfDir)
      .select(concat_ws("/", col("lang"), col("source")).as("g"),
        size(ops.Text.tokens(col("text"))).cast("double").as("v"))
    val c23 = probe("corpus_stats",
      ops.Corpus.corpusStats(spark, sfDir),
      ops.Corpus.corpusStatsApprox(spark, sfDir, accuracy),
      docs, Seq("p50_tokens_x10k" -> 0.5, "p95_tokens_x10k" -> 0.95),
      Seq("lang", "source"))

    val json = s"""{"probe":"approx_percentile","sf":"$sfDir","accuracy":$accuracy,$b13,$c23}"""
    spark.stop()
    println(json)
    val ok = !json.contains("\"ok\":false")
    if (!ok) System.exit(1)
  }

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
