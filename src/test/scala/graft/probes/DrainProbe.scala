package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r16, VERDICT #6): decide the A102 rank-vs-join reshape
  * with a measured sf10 A/B instead of the r15 paper analysis.
  *
  * SHIPPED shape: seg → groupBy(batch key) → row_number over batch
  * HEADS per stream (rows/B per stream) → join back to seg.
  * CANDIDATE shape: per-batch window aggregates (first_ts/first_tie/
  * batch_size reuse the path partitioning) + dense_rank over ALL seg
  * rows per stream — drops the groupBy+join but sorts the corpus in
  * NStreams=4 partitions.
  * Usage: DrainProbe <sfDir> [reps] */
object DrainProbe {

  /** The candidate: same seg derivation as DynStreamQueue.drainFrame,
    * then window-everything (no groupBy, no join back). */
  def drainFrameRank(queue: DataFrame, batchCount: Int): DataFrame = {
    val wPath = Window.partitionBy(col("path"))
      .orderBy(col("ts"), col("tie"), col("detail"))
    val wRun = wPath.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = queue
      .withColumn("rn", row_number().over(wPath).cast("long"))
      .withColumn("run_start",
        max(when(col("kind") =!= coalesce(
            lag(col("kind"), 1).over(wPath), lit("")), col("rn")))
          .over(wRun))
      .withColumn("pos_in_run", col("rn") - col("run_start"))
      .withColumn("sub",
        when(col("kind") === "DDL", col("pos_in_run"))
          .otherwise(expr(s"pos_in_run div $batchCount")))
      .withColumn("pos_in_batch",
        when(col("kind") === "DDL", lit(1L))
          .otherwise(col("pos_in_run") - col("sub") * batchCount + 1L))
    val wBatch = Window.partitionBy(col("path"), col("run_start"), col("sub"))
    val wStream = Window.partitionBy(col("stream"))
      .orderBy(col("first_ts"), col("first_tie"), col("path"),
        col("run_start"), col("sub"))
    seg
      .withColumn("first_ts", min(col("ts")).over(wBatch))
      .withColumn("first_tie", min(col("tie")).over(wBatch))
      .withColumn("batch_size", count(lit(1)).over(wBatch))
      .withColumn("batch_seq", dense_rank().over(wStream).cast("long"))
      .withColumn("emitted",
        when(col("kind") === "SIGNAL" && col("batch_size") > 1L &&
          col("pos_in_batch") < col("batch_size"), 0L).otherwise(1L))
      .select(col("stream"), col("area"), col("path"), col("kind"),
        col("ts"), col("tie"), col("detail"), col("batch_seq"),
        col("pos_in_batch"), col("batch_size"), col("emitted"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.GraftSession.local(cpus)
    val cl = cdc.ChangeEvents.fromEvents(
      graft.util.Tables.events(spark, dir))

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[drain] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // equality first (one pass): full-row set equality via xor-hash
    val shipped = cdc.DynStreamQueue.queueDrain(cl)
    val cand = {
      // rebuild the queue through the same private path: reuse
      // queueDrain's public surface by reconstructing via drainFrameRank
      // over the same queue frame — accessed through the package.
      drainFrameRank(graft.cdc.DynStreamQueueProbeAccess.queue(cl), 4)
    }
    def h(df: DataFrame) = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).collect().head.getLong(0)
    val (h1, h2) = (h(shipped), h(cand))
    println(s"[drain] equal=${h1 == h2} shipped=$h1 cand=$h2")

    for (r <- 1 to reps) {
      println(s"--- rep $r")
      t("shipped(join)")(force(cdc.DynStreamQueue.queueDrain(cl)))
      t("cand(rank)")(force(
        drainFrameRank(graft.cdc.DynStreamQueueProbeAccess.queue(cl), 4)))
    }
    spark.stop()
  }
}
