package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Dev probe: per-query max generated-method bytecode size across all
  * whole-stage-codegen stages (static plan, AQE off — the lint's view).
  * Usage: JitProbe <sfDir> [query ...]. Prints one line per query:
  * `name maxBytecodes stageCount` sorted desc, offenders > 8000 marked.
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only = args.drop(1).toSet
    val spark = graft.util.GraftSession.local(8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan
          val sizes = plan.collectWithSubqueries {
            case w: WholeStageCodegenExec =>
              val (_, src) = w.doCodeGen()
              val (_, stats) = CodeGenerator.compile(src)
              stats.maxMethodCodeSize
          }
          Some((name, if (sizes.isEmpty) 0 else sizes.max, sizes.size))
        } catch {
          case e: Throwable =>
            System.err.println(s"[jit] $name FAILED: ${e.getMessage}")
            None
        }
      }
    rows.sortBy(-_._2).foreach { case (n, mx, cnt) =>
      println(f"$n%-32s $mx%6d  stages=$cnt%2d ${if (mx > 8000) "  << OVER-CEILING" else ""}")
    }
    spark.stop()
  }
}
