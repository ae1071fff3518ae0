package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (temporal point-in-time) join.
  *
  * Spark has no ASOF JOIN operator. The naive range-join
  * (`l.ts >= r.ts` + argmax) explodes to |L|×|versions-per-key| rows
  * before aggregating. This implementation uses the union+window
  * technique instead: tag both sides, union, and carry the latest
  * right-side payload forward with `last(..., ignoreNulls)` over a
  * (keys, ts) ordering — ONE shuffle on the partition keys, zero row
  * amplification, spill-safe. This is the big-big scale path; for a
  * small right side a broadcast range join would also work, but this
  * form covers both.
  */
object AsOf {

  /** Left as-of join: for each left row, attach the right payload with
    * the greatest `rightTs <= leftTs` within the same `keys` group.
    * Right rows must be unique per (keys, rightTs). Left rows with no
    * prior right row get nulls.
    *
    * @param payload right-side columns to attach (must not collide with
    *                left column names)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++ payload.map(col): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts => inclusive <=
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
