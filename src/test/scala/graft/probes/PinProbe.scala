package graft
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local(4)
    val df = ops.Corpus.seqPack(spark, args(0))
    println("== sparkPlan ==")
    println(df.queryExecution.sparkPlan.toString.take(3000))
    spark.stop()
  }
}
