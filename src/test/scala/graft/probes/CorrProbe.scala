package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev instrument: measure B23 q_corr_agg_subquery plan variants at a
  * given SF dir. The r9 cell collapse measured 3.4x slower (a 60M-group
  * hash-agg that reduces nothing); this probe times the two remaining
  * candidate shapes against the shipping decorrelated join:
  *   current — groupBy(partkey) stats + join back (2 scans, 1 full
  *             shuffle + 1 tiny agg shuffle)
  *   window  — sum/count over partitionBy(partkey) (1 scan, 1 full
  *             shuffle + a per-partition sort)
  *   reuse   — repartition(partkey) once, agg + join both consume the
  *             same exchange (1 scan, 1 full shuffle, ReuseExchange)
  * Usage: CorrProbe <sfDir> [variant...]
  */
object CorrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variants = if (args.length > 1) args.drop(1).toSet
                   else Set("current", "window", "reuse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.GraftSession.local(cpus)
    import graft.util.Tables

    def li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    def partDim = broadcast(Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand")))
    def finish(df: org.apache.spark.sql.DataFrame) = df
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lots"),
        sum(graft.util.Money.cents(col("l_extendedprice")))
          .as("lost_revenue_cents"))

    def current = {
      val stats = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      finish(li.join(stats, "l_partkey")
        .filter(col("qty") * 5L * col("cnt") < col("sum_qty")))
    }
    def window = {
      val w = Window.partitionBy(col("l_partkey"))
      finish(li
        .withColumn("sum_qty", sum(col("qty")).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("qty") * 5L * col("cnt") < col("sum_qty")))
    }
    def reuse = {
      val p = li.repartition(col("l_partkey"))
      val stats = p.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      finish(p.join(stats, "l_partkey")
        .filter(col("qty") * 5L * col("cnt") < col("sum_qty")))
    }

    val all = Seq("current" -> (() => current), "window" -> (() => window),
                  "reuse" -> (() => reuse))
    for (pass <- 1 to 2; (tag, f) <- all if variants(tag)) {
      val t0 = System.nanoTime()
      val rows = f().collect()
      println(f"pass$pass $tag%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=${rows.length}")
    }
    spark.stop()
  }
}
