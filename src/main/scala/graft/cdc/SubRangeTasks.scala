package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A113 — subscription-client range-task division: how a subscribed
  * span fissions into per-region subscribe tasks, and how the division
  * re-splits when the region grid changes mid-flight (VERDICT r9
  * missing #2 — the task fission that FEEDS A96/A97's assumed region
  * grid).
  *
  * Reference: `logservice/logpuller/subscription_client.go:92-96`
  * (rangeTask = a span slice of a subscription, re-enqueued via
  * `scheduleRangeRequest` :633-641), `:510-521 handleRangeTasks`, and
  * `:525-607 divideSpanAndScheduleRegionRequests`:
  *   1. load the regions intersecting `nextSpan` (batched, limit 1024);
  *   2. `regionlock/util.go:33-58 CutRegionsLeftCoverSpan` — sort by
  *      start key, require the first region to start at-or-before the
  *      span start, and KEEP ONLY the gap-free prefix (a discontinuity
  *      = a region-cache hole: everything after it is dropped and
  *      retried after a backoff);
  *   3. per kept region, the task span is
  *      `GetIntersectSpan(subscribedSpan, regionSpan)` (:585-590) —
  *      clamped to the subscription, never empty;
  *   4. `nextSpan.StartKey = region.EndKey` (:598) until the span end
  *      is covered;
  *   5. a stale region ver (region split/merge since the cache read)
  *      sends the failed range back through `scheduleRangeRequest`
  *      (:617-623 LockRangeStatusStale → RetryRanges) — the re-split
  *      arm: round 2 runs against the CHANGED grid.
  *
  * Deterministic model per (schema_name, table_name): the key space is
  * the changelog's pk span [lo, hi]; the subscription covers its middle
  * six eighths (so the first/last task exercise the intersection
  * clamp); the generation-1 grid is [[NRegions]] equal slices with ONE
  * region missing — a cache hole at index `1 + tableRank mod
  * (NRegions-2)` (never the first region, whose presence the left-cover
  * rule needs; never past the subscription end). Round 1 emits
  * subscribe tasks for the gap-free prefix and ONE retry_remainder row
  * for the rest of the span. Round 2 reloads the grid: the hole is
  * healed and the formerly-missing region has SPLIT in two (epoch 2 —
  * the region-change the stale arm exists for), so the remainder
  * divides over the new geometry to completion. Region ids follow the
  * grid (tableRank·100 + idx; the split halves take +50/+51, their ver
  * bumps to 2 — `tikv.NewRegionVerID` in :592).
  *
  * Scale shape: dimension-scale only — the table universe × a ≤
  * [[NRegions]]+1 sequence explode against the broadcast per-table
  * bounds; the single changelog pass is the partial-aggregated bounds
  * build. No corpus-scale shuffle, no window. */
object SubRangeTasks {

  val NRegions = 6

  /** per-table pk bounds + rank (the A107 tableUniverse discipline) */
  def rangeTasks(cl: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = cl.groupBy(col("schema_name"), col("table_name"))
      .agg(min(col("pk")).as("lo"), max(col("pk")).as("hi"))
      .withColumn("rank",
        row_number().over(graft.util.Windows.bounded(col("schema_name"),
          col("table_name"))).cast("long") - 1L)
      .withColumn("w", col("hi") - col("lo") + 1L)
      // subscription = the middle six eighths of the table span; a
      // degenerate span (w = 1, single-pk table) would collapse
      // sub_start == sub_end and silently emit ZERO tasks (ADVICE
      // r10), so sub_end clamps to at least sub_start + 1 — a no-op
      // for every w >= 2 (7w/8 >= w/8 + 1 there)
      .withColumn("sub_start", col("lo") + expr("w div 8"))
      .withColumn("sub_end",
        greatest(col("lo") + expr("(7 * w) div 8"),
          col("lo") + expr("w div 8") + 1L))
      .withColumn("hole", lit(1L) + pmod(col("rank"), lit(NRegions.toLong - 2L)))
    val n = NRegions.toLong
    // one row per (table, region index, round); the split halves of the
    // healed hole take sub-indices via the extra explode values n, n+1
    val grid = bounds.select(col("schema_name"), col("table_name"),
        col("rank"), col("lo"), col("w"), col("sub_start"), col("sub_end"),
        col("hole"),
        explode(sequence(lit(0L), lit(n + 1L))).as("i"))
      // geometry: i < n → generation-1 slice i; i = n / n+1 → the two
      // epoch-2 halves of the hole region
      .withColumn("g_start",
        when(col("i") < n, col("lo") + expr(s"(i * w) div $n"))
          .when(col("i") === n, col("lo") + expr(s"(hole * w) div $n"))
          .otherwise(col("lo")
            + expr(s"((hole * w) div $n + ((hole + 1) * w) div $n) div 2")))
      .withColumn("g_end",
        when(col("i") < n, col("lo") + expr(s"((i + 1) * w) div $n"))
          .when(col("i") === n, col("lo")
            + expr(s"((hole * w) div $n + ((hole + 1) * w) div $n) div 2"))
          .otherwise(col("lo") + expr(s"((hole + 1) * w) div $n")))
      .withColumn("epoch", when(col("i") < n, 1L).otherwise(2L))
      .withColumn("region_id",
        when(col("i") < n, col("rank") * 100L + col("i"))
          .otherwise(col("rank") * 100L + 50L + (col("i") - n)))
    grid
      // a region yields a task iff it intersects the subscription and,
      // in its round, it is visible: round 1 sees generation 1 minus
      // the hole and stops at the hole (left-cover prefix); round 2
      // sees the healed geometry from the hole onward
      .withColumn("round",
        when(col("epoch") === 2L, 2L)
          .when(col("i") < col("hole"), 1L)
          .otherwise(when(col("i") === col("hole"), lit(null).cast("long"))
            .otherwise(2L)))
      .filter(col("round").isNotNull &&
        col("g_start") < col("sub_end") && col("g_end") > col("sub_start"))
      .withColumn("task_start", greatest(col("g_start"), col("sub_start")))
      .withColumn("task_end", least(col("g_end"), col("sub_end")))
      .withColumn("status", lit("subscribed"))
      .select(col("schema_name"), col("table_name"),
        col("rank").as("sub_id"), col("round"), col("region_id"),
        col("epoch").as("region_epoch"), col("g_start").as("region_start"),
        col("g_end").as("region_end"), col("task_start"), col("task_end"),
        col("status"))
      // the round-1 remainder row: the hole truncates the left-cover
      // prefix, so [hole_start, sub_end) re-enters the task channel
      .unionByName(bounds
        .withColumn("hole_start",
          greatest(col("lo") + expr(s"(hole * w) div $n"), col("sub_start")))
        .filter(col("hole_start") < col("sub_end"))
        .select(col("schema_name"), col("table_name"),
          col("rank").as("sub_id"), lit(1L).as("round"),
          lit(-1L).as("region_id"), lit(-1L).as("region_epoch"),
          lit(-1L).as("region_start"), lit(-1L).as("region_end"),
          col("hole_start").as("task_start"), col("sub_end").as("task_end"),
          lit("retry_remainder").as("status")))
  }

  val rangeTasksSql: String = {
    val n = NRegions
    s"""WITH bounds AS (
       |  SELECT schema_name, table_name,
       |    CAST(MIN(pk) AS BIGINT) AS lo, CAST(MAX(pk) AS BIGINT) AS hi,
       |    CAST(ROW_NUMBER() OVER (ORDER BY schema_name, table_name)
       |      AS BIGINT) - 1 AS rank
       |  FROM changelog GROUP BY 1, 2
       |), b AS (
       |  SELECT *, hi - lo + 1 AS w,
       |    lo + (hi - lo + 1) // 8 AS sub_start,
       |    GREATEST(lo + (7 * (hi - lo + 1)) // 8,
       |             lo + (hi - lo + 1) // 8 + 1) AS sub_end,
       |    1 + rank % ${n - 2} AS hole
       |  FROM bounds
       |), grid AS (
       |  SELECT b.*, i.i,
       |    CASE WHEN i.i < $n THEN lo + (i.i * w) // $n
       |         WHEN i.i = $n THEN lo + (hole * w) // $n
       |         ELSE lo + ((hole * w) // $n + ((hole + 1) * w) // $n) // 2
       |    END AS g_start,
       |    CASE WHEN i.i < $n THEN lo + ((i.i + 1) * w) // $n
       |         WHEN i.i = $n
       |           THEN lo + ((hole * w) // $n + ((hole + 1) * w) // $n) // 2
       |         ELSE lo + ((hole + 1) * w) // $n
       |    END AS g_end,
       |    CASE WHEN i.i < $n THEN 1 ELSE 2 END AS epoch,
       |    CASE WHEN i.i < $n THEN rank * 100 + i.i
       |         ELSE rank * 100 + 50 + (i.i - $n) END AS region_id,
       |    CASE WHEN i.i >= $n THEN 2
       |         WHEN i.i < hole THEN 1
       |         WHEN i.i = hole THEN NULL
       |         ELSE 2 END AS round
       |  FROM b CROSS JOIN (SELECT UNNEST(range(0, ${n + 2})) AS i) i
       |)
       |SELECT schema_name, table_name, CAST(rank AS BIGINT) AS sub_id,
       |  CAST(round AS BIGINT) AS round, CAST(region_id AS BIGINT) AS region_id,
       |  CAST(epoch AS BIGINT) AS region_epoch,
       |  CAST(g_start AS BIGINT) AS region_start,
       |  CAST(g_end AS BIGINT) AS region_end,
       |  CAST(GREATEST(g_start, sub_start) AS BIGINT) AS task_start,
       |  CAST(LEAST(g_end, sub_end) AS BIGINT) AS task_end,
       |  'subscribed' AS status
       |FROM grid
       |WHERE round IS NOT NULL AND g_start < sub_end AND g_end > sub_start
       |UNION ALL
       |SELECT schema_name, table_name, CAST(rank AS BIGINT),
       |  CAST(1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       |  CAST(GREATEST(lo + (hole * w) // $n, sub_start) AS BIGINT),
       |  CAST(sub_end AS BIGINT), 'retry_remainder'
       |FROM b
       |WHERE GREATEST(lo + (hole * w) // $n, sub_start) < sub_end""".stripMargin
  }
}
