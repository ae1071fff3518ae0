package graft

import org.apache.spark.sql.functions._

/** Dev instrument: stage-by-stage timing of the B13 exact-quantile
  * shapes at a given SF dir, plus a split-geometry sweep, to locate
  * the sf10 hot spot.
  * Usage: QuantileProbe <sfDir> */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.GraftSession.local(cpus)
    val li = graft.util.Tables.lineitem(spark, dir)
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (mpb <- Seq("512k", "512k", "2m", "4m", "8m", "16m", "4m")) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      t(s"scan-count mpb=$mpb") { li.select(col("l_extendedprice")).count() }
    }
    t("price-weighted-pct") {
      li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.95), c)"))
        .collect()
    }
    t("full-query") {
      graft.queries.Analytics.qApproxQuantile(spark, dir).collect()
    }
    spark.stop()
  }
}
