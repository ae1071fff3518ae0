package graft.util

import org.apache.spark.sql.SparkSession

/** Shared SparkSession defaults for the graft engine.
  *
  * - UTC session time zone (oracle parity with DuckDB).
  * - `nanosAsLong`: the driver's events.parquet carries TIMESTAMP(NANOS)
  *   which Spark 4 cannot map natively; we read nanos as long and convert
  *   with `timestamp_micros(ts div 1000)` (identical to DuckDB's
  *   ns->us cast truncation for positive epochs).
  * - AQE on: runtime coalescing + skew-join splitting matter at scale.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.functions.VectorExprs.register)
      .withExtensions(graft.functions.WireExprs.register)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // ~100 queries x several codegen stages each far exceeds the
      // default 100-entry generated-class cache: a pass-interleaved
      // bench (or any long-lived session composing many operators)
      // would recompile + re-JIT every stage on every revisit. Static
      // conf — must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "10000")

  /** Test/dev session. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Release every frame the engine pinned in this session: the
    * CacheManager entries (the cross-query gram cache `persist`) and
    * every checkpointed RDD (the `localCheckpoint` frames the dedup /
    * similarity self-join pipelines materialize). One-shot drivers
    * (Verify, Bench) never need this — executor storage dies with the
    * session — but a long-lived session composing many operators
    * should call it between pipelines or executor memory/disk
    * accumulates one checkpoint per operator run.
    *
    * CAUTION: this invalidates DataFrames RETURNED by earlier operator
    * calls, not just the internal caches. A `localCheckpoint` truncates
    * lineage, so a released checkpoint cannot recompute — re-collecting
    * a pre-release result frame throws (cache-backed frames merely
    * recompute). Collect or write results you still need first; after
    * release, re-invoke the operator for a fresh frame. */
  def releaseCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))
    graft.ops.Curation.clearMemo()
    // Every memo holding checkpoint-backed frames must drop with the
    // blocks above, or later lookups serve frames whose blocks are gone
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on first action).
    graft.ops.Similarity.clearIvfMemo()
    graft.ops.Corpus.clearRepetitionMemo()
    graft.ops.Retrieval.clearWinnowMemo()
  }
}
