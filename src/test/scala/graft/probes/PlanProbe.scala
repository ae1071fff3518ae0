package graft

/** Dev instrument: print the formatted physical plan (and optionally
  * time the action) for any registered query at any SF dir.
  * Usage: PlanProbe <sfDir> <query> [time] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.util.GraftSession.local(cpus)
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.length > 2 && args(2) == "time") {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      df.explain("formatted") // post-run: shows the final AQE plan
    } else df.explain("formatted")
    spark.stop()
  }
}
