package graft

import org.apache.spark.sql.functions._

/** Dev instrument: time xxhash-forcing each column of a registered
  * query separately to locate the hot expression.
  * Usage: ColProbe <sfDir> <query> */
object ColProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.util.GraftSession.local(cpus)
    val df = SparkEntry.queries(name)(spark, dir)
    def force(cols: Seq[String]): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(cols.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"ALL: ${force(df.columns.toSeq)}%.2f s")
    df.columns.foreach { c =>
      println(f"$c%-24s ${force(Seq(c))}%.2f s")
    }
    spark.stop()
  }
}
