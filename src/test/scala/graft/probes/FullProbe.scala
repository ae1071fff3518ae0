package graft
import org.apache.spark.sql.functions._
object FullProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.util.GraftSession.local(cpus)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val tPlan = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimize+physical planning
      val tExec0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      val tEnd = System.nanoTime()
      println(f"[full] rep $r plan=${(tExec0 - t0) / 1e9}%6.3f exec=${(tEnd - tExec0) / 1e9}%6.3f total=${(tEnd - t0) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
