package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A77 — the event service's scan-task decision (reference:
  * pkg/eventservice/event_broker.go:302-351 `checkNeedScan` +
  * pkg/eventservice/dispatcher_stat.go:121-137 `getDataRange`): for
  * every registered dispatcher span the broker decides, each poll,
  * whether to scan the event store or just advance the dispatcher's
  * watermark:
  *
  *  1. `startTs = max(sentResolvedTs, resetTs)`; if the dispatcher has
  *     caught up to the store's resolvedTs there is NO RANGE to scan
  *     (dispatcher_stat.go:127-128);
  *  2. the range end is CLAMPED by the table's DDL-event state —
  *     `endTs = min(storeResolvedTs, ddlResolvedTs)` — and a clamp at
  *     or below startTs cancels the scan (event_broker.go:322-327);
  *  3. if no DML (`startTs >= latestCommitTs`) and no DDL
  *     (`startTs >= ddlMaxEventCommitTs`) can exist in the range, the
  *     broker skips the scan and SENDS THE WATERMARK directly
  *     (event_broker.go:331-338);
  *  4. otherwise it scans `(startTs, endTs]`.
  *
  * Dispatcher state is modeled deterministically over the A69 region
  * spans (region = pk-hash bucket, region resolvedTs = its max
  * commitTs), replaying a mixed fleet by `region_id mod 4`:
  * class 0 LAGS (sent = last syncpoint-aligned boundary), class 1 has
  * CAUGHT UP (sent = resolved), class 2 is IDLE-ADVANCED (sent =
  * resolved, store resolved heartbeat-advanced one cadence past the
  * last commit — the broker's watermark-only fast path), class 3 is
  * DDL-STALLED (the schemastore's resolvedTs stuck at the dispatcher's
  * own boundary — the clamp arm that cancels the scan). The table's
  * DDL state otherwise sits one half-cadence past the region frontier,
  * with max DDL commit at the last schema-version boundary (SchemaStore
  * step grid). All four broker decisions appear in the production
  * frame; the oracle checks the full rule arithmetic.
  *
  * Scale shape: dispatcher state is dimension-scale (tables × regions)
  * — one partial-aggregated pass over the changelog builds it; the
  * scan-range count re-reads the changelog once against the BROADCAST
  * task frame (equi on (table, region) + the ts range as a
  * post-filter), partial-aggregated before the final join. */
object EventService {

  /** A77: one row per dispatcher span with its scan decision. */
  def scanTasks(cl: DataFrame, nRegions: Int = 8, syncStep: Long = 100L): DataFrame = {
    val step = SchemaStore.step
    val withRegion = cl.withColumn("region_id",
      graft.functions.Portable.bucket(col("pk").cast("string"), nRegions))
    // per-span state + the global DDL grid constant
    val spans = withRegion
      .groupBy(col("schema_name"), col("table_name"), col("region_id"))
      .agg(max(col("commit_ts")).as("rts"))
      .withColumn("cls", pmod(col("region_id"), lit(4L)))
      .withColumn("aligned", expr(s"(rts div $syncStep) * $syncStep"))
      .withColumn("sent_ts",
        when(col("cls") === 0L || col("cls") === 3L, col("aligned"))
          .otherwise(col("rts")))
      .withColumn("store_resolved_ts",
        when(col("cls") === 2L, col("rts") + syncStep).otherwise(col("rts")))
      .withColumn("latest_commit_ts", col("rts"))
      .withColumn("ddl_resolved_ts",
        when(col("cls") === 3L, col("aligned"))
          .otherwise(col("rts") + syncStep / 2))
    val ddlMax = cl.agg(
      expr(s"(max(commit_ts) div $step) * $step").as("ddl_max_commit_ts"))
    val tasks = spans.crossJoin(broadcast(ddlMax))
      .withColumn("start_ts", col("sent_ts")) // resetTs = 0 in this replay
      .withColumn("end_ts",
        least(col("store_resolved_ts"), col("ddl_resolved_ts")))
      .withColumn("decision",
        when(col("start_ts") >= col("store_resolved_ts"), "no_range")
          .when(col("end_ts") <= col("start_ts"), "ddl_clamped")
          .when(col("start_ts") >= col("latest_commit_ts") &&
            col("start_ts") >= col("ddl_max_commit_ts"), "watermark_only")
          .otherwise(lit("scan")))
    // scan-range event counts: broadcast the dimension-scale task frame,
    // partial-aggregate the in-range events per span
    val scanRanges = tasks.filter(col("decision") === "scan")
      .select(col("schema_name").as("s"), col("table_name").as("t"),
        col("region_id").as("r"), col("start_ts").as("lo"), col("end_ts").as("hi"))
    val counts = withRegion.join(broadcast(scanRanges),
        col("schema_name") === col("s") && col("table_name") === col("t") &&
          col("region_id") === col("r") &&
          col("commit_ts") > col("lo") && col("commit_ts") <= col("hi"))
      .groupBy(col("s"), col("t"), col("r"))
      .agg(count(lit(1)).as("n_events"))
    tasks.join(counts,
        col("schema_name") === col("s") && col("table_name") === col("t") &&
          col("region_id") === col("r"), "left")
      .select(col("schema_name"), col("table_name"), col("region_id"),
        col("start_ts"), col("end_ts"), col("store_resolved_ts"),
        col("decision"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  def scanTasksSql(nRegions: Int = 8, syncStep: Long = 100L): String = {
    val step = SchemaStore.step
    val bucket = graft.functions.Portable.bucketSql("CAST(pk AS VARCHAR)", nRegions)
    s"""WITH regioned AS (
       |  SELECT schema_name, table_name, $bucket AS region_id, commit_ts
       |  FROM changelog
       |),
       |spans AS (
       |  SELECT schema_name, table_name, region_id, MAX(commit_ts) AS rts,
       |    region_id % 4 AS cls,
       |    (MAX(commit_ts) // $syncStep) * $syncStep AS aligned
       |  FROM regioned GROUP BY 1, 2, 3
       |),
       |st AS (
       |  SELECT schema_name, table_name, region_id, rts,
       |    CASE WHEN cls IN (0, 3) THEN aligned ELSE rts END AS start_ts,
       |    CASE WHEN cls = 2 THEN rts + $syncStep ELSE rts END AS store_resolved_ts,
       |    rts AS latest_commit_ts,
       |    CASE WHEN cls = 3 THEN aligned ELSE rts + ${syncStep / 2} END AS ddl_resolved_ts,
       |    (SELECT (MAX(commit_ts) // $step) * $step FROM changelog) AS ddl_max_commit_ts
       |  FROM spans
       |),
       |tasks AS (
       |  SELECT schema_name, table_name, region_id, start_ts,
       |    LEAST(store_resolved_ts, ddl_resolved_ts) AS end_ts,
       |    store_resolved_ts,
       |    CASE
       |      WHEN start_ts >= store_resolved_ts THEN 'no_range'
       |      WHEN LEAST(store_resolved_ts, ddl_resolved_ts) <= start_ts THEN 'ddl_clamped'
       |      WHEN start_ts >= latest_commit_ts AND start_ts >= ddl_max_commit_ts
       |        THEN 'watermark_only'
       |      ELSE 'scan'
       |    END AS decision
       |  FROM st
       |),
       |counts AS (
       |  SELECT t.schema_name, t.table_name, t.region_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM tasks t JOIN regioned e
       |    ON e.schema_name = t.schema_name AND e.table_name = t.table_name
       |   AND e.region_id = t.region_id
       |   AND e.commit_ts > t.start_ts AND e.commit_ts <= t.end_ts
       |  WHERE t.decision = 'scan'
       |  GROUP BY 1, 2, 3
       |)
       |SELECT t.schema_name, t.table_name, t.region_id, t.start_ts, t.end_ts,
       |  t.store_resolved_ts, t.decision,
       |  COALESCE(c.n_events, 0) AS n_events
       |FROM tasks t LEFT JOIN counts c
       |  ON c.schema_name = t.schema_name AND c.table_name = t.table_name
       | AND c.region_id = t.region_id""".stripMargin
  }
}
