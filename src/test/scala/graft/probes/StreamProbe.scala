package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe for the streaming state layout (the r8 verdict item 9):
  * replays one streaming op over the SF's events file and dumps the
  * per-micro-batch duration breakdown + state-operator metrics, so a
  * rows/s number can be ATTRIBUTED (join build vs state commit vs
  * planning) instead of guessed.
  *
  * Usage: tools/run.sh graft.StreamProbe <sfDir> [op] [chunks] [mfpt] [parts]
  *   op     = range_join (default) | txn_match | cdc_pipeline |
  *            snapshot_state
  *   chunks = split the events file into N parquet chunk files first,
  *            so AvailableNow runs N micro-batches instead of 1
  *            (maxFilesPerTrigger=1) — shows whether per-batch state
  *            eviction pays for the extra batch overhead.
  *   mfpt   = maxFilesPerTrigger (default 1); point sfDir at a
  *            pre-sliced tier copy (make_stream_slices.py) with
  *            chunks=1, mfpt=2 to reproduce the bench's *_mb shape
  *            batch-for-batch.
  *   parts  = spark.sql.shuffle.partitions for THIS query (default:
  *            session 32). State store instances = partitions × 4 for
  *            a symmetric hash join, and each instance commits a delta
  *            file per micro-batch — the A/B that attributes the mb
  *            commit cost to store count. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = if (args.length > 1) args(1) else "range_join"
    val chunks = if (args.length > 2) args(2).toInt else 1
    val mfpt = if (args.length > 3) args(3) else "1"
    val parts = if (args.length > 4) Some(args(4)) else None
    val spark = graft.util.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))

    val srcPath =
      if (chunks <= 1) s"$sfDir/events.parquet*"
      else {
        val dir = s"/tmp/streamprobe_chunks"
        val n = spark.read.parquet(s"$sfDir/events.parquet").count()
        spark.read.parquet(s"$sfDir/events.parquet")
          .repartitionByRange(chunks, col("event_id"))
          .write.mode("overwrite").parquet(dir)
        println(s"[probe] $n rows -> $chunks chunk files")
        s"$dir/part-*"
      }
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", mfpt).parquet(srcPath)
    val df = op match {
      case "txn_match" =>
        import spark.implicits._
        streaming.CdcStream.txnMatch(
          cdc.TxnMatcher.rawStream(cdc.ChangeEvents.fromEvents(in))
            .as[streaming.CdcStream.RawKv]).toDF()
      case "cdc_pipeline" =>
        streaming.CdcStream.pipeline(spark, sfDir)
      case "snapshot_state" =>
        import spark.implicits._
        streaming.CdcStream.snapshotState(
          cdc.ChangeEvents.fromEvents(in)
            .withColumn("before_value", col("before_value").cast("double"))
            .as[streaming.CdcStream.ChangeEvent]).toDF()
      case _ => streaming.DataOps.streamRangeJoin(in)
    }
    val mode = if (op == "snapshot_state") "update" else "append"
    val t0 = System.nanoTime()
    val q = df.writeStream.format("noop").outputMode(mode)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    println(f"[probe] $op: $rows rows in $wall%.2f s = ${rows / wall}%.0f rows/s, ${progress.length} progress entries")
    progress.filter(_.numInputRows > 0).foreach { p =>
      val d = p.durationMs
      println(f"[probe] batch ${p.batchId}%3d rows=${p.numInputRows}%8d " +
        f"addBatch=${d.getOrDefault("addBatch", -1L)}%6d ms " +
        f"commit=${d.getOrDefault("commitBatch", -1L)}%5d ms " +
        f"getBatch=${d.getOrDefault("getBatch", -1L)}%5d ms " +
        f"plan=${d.getOrDefault("queryPlanning", -1L)}%5d ms " +
        f"trigger=${d.getOrDefault("triggerExecution", -1L)}%6d ms")
      p.stateOperators.foreach { s =>
        println(f"[probe]   state: op=${s.operatorName} rowsTotal=${s.numRowsTotal}%8d " +
          f"updated=${s.numRowsUpdated}%8d removed=${s.numRowsRemoved}%8d " +
          f"commitMs=${s.commitTimeMs}%6d memUsed=${s.memoryUsedBytes / 1024 / 1024} MB")
      }
    }
    q.stop()
    spark.stop()
  }
}
