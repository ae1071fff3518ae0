package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}

/** Audit probe: list every query whose optimized plan contains an
  * unpartitioned Window with no GlobalLimit below it (the shape that
  * pulls a whole frame into one task). Used to build / maintain the
  * bounded-grid allowlist in PlanQualitySpec.
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.util.GraftSession.local(4)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val lp = fn(spark, dir).queryExecution.optimizedPlan
        val bad = lp.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst { case _: GlobalLimit => () }.isEmpty => w
        }
        if (bad.nonEmpty)
          println(s"UNPART $name : ${bad.size} window(s)")
      } catch {
        case e: Throwable => println(s"ERROR $name : ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
