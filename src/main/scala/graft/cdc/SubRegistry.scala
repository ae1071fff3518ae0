package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A106 — the eventstore's dispatcher/subscription registry: the
  * sharing layer that decides whether a newly-registered dispatcher
  * can ride an EXISTING upstream subscription or needs its own — the
  * difference between one TiKV change feed shared by N dispatchers
  * and N redundant feeds.
  *
  * Reference: logservice/eventstore/event_store.go:367-495
  * `RegisterDispatcher` — a candidate subscription on the same table
  * span is reusable iff `checkpointTs <= startTs <= resolvedTs`
  * (:406-409: data ≤ checkpointTs may already be deleted, so a
  * STALER dispatcher must not attach; data above resolvedTs hasn't
  * arrived for anyone, so a FRESHER one may — the equality arm is the
  * no-resolved-yet special case); on a miss with `onlyReuse` the
  * registration FAILS with no state change (:430-432, the two-phase
  * register the dispatcher manager runs), otherwise a new
  * subscription starts with checkpoint = resolved = startTs
  * (:440-455). :497-536 `UnregisterDispatcher` — subscriptions are
  * REFCOUNTED: the last leaving dispatcher tears the subscription
  * down (:518-523). :475-490 `advanceResolvedTs` — resolved
  * timestamps only move forward (stale advances are dropped).
  * :538-582 `UpdateDispatcherCheckpointTs` is commented out in the
  * reference — a subscription's checkpoint stays at its creation
  * startTs, which is exactly what this replay models.
  *
  * Determinization: the Go candidate scan iterates a map
  * (:395-401) — nondeterministic pick among multiple reusable
  * subscriptions; this frame picks the LOWEST subscription id, the
  * oldest surviving feed.
  *
  * Deterministic replay: every (schema, table) runs the same 8-tick
  * script over its own commit-ts span [lo, hi] (t3 = lo + (hi−lo)/3,
  * t23 = lo + 2(hi−lo)/3): REG d0@lo (new sub), ADVANCE→t23, REG
  * d1@t3 (reuse — inside [lo, t23]), REG d2@lo−1 (below checkpoint →
  * new sub: the staler-dispatcher arm), REG d3@hi+100 onlyReuse
  * (above every resolvedTs → FAIL, no state change), UNREG d1, UNREG
  * d0 (refcount hits zero → the subscription DIES), REG d4@t3 (the
  * dead subscription is gone and the survivor's window [lo−1, lo−1]
  * excludes t3 → new sub). Every reference arm fires on every table.
  *
  * Scale shape: the fold is 8 ticks per TABLE inside Catalyst as a
  * higher-order `aggregate` (the A82/A91/A92 discipline — no driver
  * loop, no corpus-scale window); the only full-data pass is the
  * per-table min/max partial aggregation.
  */
object SubRegistry {

  /** Per-table 8-tick registration script (see object doc). */
  def subTrace(cl: DataFrame): DataFrame =
    cl.groupBy(col("schema_name"), col("table_name"))
      .agg(min(col("commit_ts")).as("lo"), max(col("commit_ts")).as("hi"))
      .withColumn("t3", col("lo") + expr("(hi - lo) div 3"))
      .withColumn("t23", col("lo") + expr("(2 * (hi - lo)) div 3"))
      .select(col("schema_name"), col("table_name"),
        explode(expr(
          """array(
            |  named_struct('tick', 0L, 'kind', 'REG',   'disp', 0L, 'ts', lo,       'only_reuse', 0L),
            |  named_struct('tick', 1L, 'kind', 'ADV',   'disp', -1L, 'ts', t23,     'only_reuse', 0L),
            |  named_struct('tick', 2L, 'kind', 'REG',   'disp', 1L, 'ts', t3,       'only_reuse', 0L),
            |  named_struct('tick', 3L, 'kind', 'REG',   'disp', 2L, 'ts', lo - 1L,  'only_reuse', 0L),
            |  named_struct('tick', 4L, 'kind', 'REG',   'disp', 3L, 'ts', hi + 100L, 'only_reuse', 1L),
            |  named_struct('tick', 5L, 'kind', 'UNREG', 'disp', 1L, 'ts', -1L,      'only_reuse', 0L),
            |  named_struct('tick', 6L, 'kind', 'UNREG', 'disp', 0L, 'ts', -1L,      'only_reuse', 0L),
            |  named_struct('tick', 7L, 'kind', 'REG',   'disp', 4L, 'ts', t3,       'only_reuse', 0L))""".stripMargin)).as("e"))
      .select(col("schema_name"), col("table_name"), col("e.tick").as("tick"),
        col("e.kind").as("kind"), col("e.disp").as("disp"),
        col("e.ts").as("ts"), col("e.only_reuse").as("only_reuse"))

  private val subsType =
    "ARRAY<STRUCT<sid: BIGINT, cp: BIGINT, rts: BIGINT, nd: BIGINT>>"
  private val asgType = "ARRAY<STRUCT<disp: BIGINT, sid: BIGINT>>"
  private val outType =
    """ARRAY<STRUCT<tick: BIGINT, kind: STRING, disp: BIGINT, ts: BIGINT,
      |  decision: STRING, sid: BIGINT, n_subs: BIGINT, n_disp: BIGINT,
      |  died: BIGINT>>""".stripMargin

  /** One fold arm: post-event registry (`subs`/`asg`/`nsid` SQL over
    * `acc`/`e`) plus the emitted trace row. */
  private def arm(subs: String, asg: String, nsid: String,
                  decision: String, sid: String, died: String): String =
    s"""named_struct('subs', $subs, 'asg', $asg, 'nsid', $nsid,
       |  'out', concat(acc.out, array(named_struct(
       |    'tick', e.tick, 'kind', e.kind, 'disp', e.disp, 'ts', e.ts,
       |    'decision', $decision, 'sid', CAST($sid AS BIGINT),
       |    'n_subs', CAST(size($subs) AS BIGINT),
       |    'n_disp', aggregate($subs, 0L, (a, s) -> a + s.nd),
       |    'died', CAST($died AS BIGINT)))))""".stripMargin

  /** The reusable-candidate set: event_store.go:406-409. */
  private val cands = "filter(acc.subs, s -> s.cp <= e.ts AND e.ts <= s.rts)"
  private val reuseSid = s"array_min(transform($cands, s -> s.sid))"
  private val unregSid = "element_at(filter(acc.asg, a -> a.disp = e.disp), 1).sid"

  private def foldExpr: String =
    s"""aggregate(
       |  evs,
       |  named_struct('subs', CAST(array() AS $subsType),
       |    'asg', CAST(array() AS $asgType), 'nsid', 1L,
       |    'out', CAST(array() AS $outType)),
       |  (acc, e) -> CASE
       |    WHEN e.kind = 'ADV' THEN
       |      ${arm(
             "transform(acc.subs, s -> named_struct('sid', s.sid, 'cp', s.cp, " +
               "'rts', greatest(s.rts, e.ts), 'nd', s.nd))",
             "acc.asg", "acc.nsid", "'advance'", "-1", "0")}
       |    WHEN e.kind = 'REG' AND size($cands) > 0 THEN
       |      ${arm(
             s"transform(acc.subs, s -> named_struct('sid', s.sid, 'cp', s.cp, " +
               s"'rts', s.rts, 'nd', s.nd + IF(s.sid = $reuseSid, 1L, 0L)))",
             s"concat(acc.asg, array(named_struct('disp', e.disp, 'sid', $reuseSid)))",
             "acc.nsid", "'reuse'", reuseSid, "0")}
       |    WHEN e.kind = 'REG' AND e.only_reuse = 1 THEN
       |      ${arm("acc.subs", "acc.asg", "acc.nsid",
             "'fail_only_reuse'", "-1", "0")}
       |    WHEN e.kind = 'REG' THEN
       |      ${arm(
             "concat(acc.subs, array(named_struct('sid', acc.nsid, 'cp', e.ts, " +
               "'rts', e.ts, 'nd', 1L)))",
             "concat(acc.asg, array(named_struct('disp', e.disp, 'sid', acc.nsid)))",
             "acc.nsid + 1L", "'new'", "acc.nsid", "0")}
       |    ELSE
       |      ${arm(
             s"filter(transform(acc.subs, s -> named_struct('sid', s.sid, " +
               s"'cp', s.cp, 'rts', s.rts, " +
               s"'nd', s.nd - IF(s.sid = $unregSid, 1L, 0L))), s -> s.nd > 0)",
             "filter(acc.asg, a -> a.disp != e.disp)",
             "acc.nsid",
             s"IF(element_at(filter(acc.subs, s -> s.sid = $unregSid), 1).nd = 1L, " +
               "'unreg_close', 'unreg')",
             unregSid,
             s"IF(element_at(filter(acc.subs, s -> s.sid = $unregSid), 1).nd = 1L, 1, 0)")}
       |  END,
       |  acc -> acc.out)""".stripMargin

  /** Core frame, spec-drivable from any (schema_name, table_name,
    * tick, kind, disp, ts, only_reuse) trace. One output row per
    * event with the decision and the post-event registry gauges. */
  def subRegistryFrame(trace: DataFrame): DataFrame =
    trace
      .groupBy(col("schema_name"), col("table_name"))
      .agg(sort_array(collect_list(struct(col("tick"), col("kind"),
        col("disp"), col("ts"), col("only_reuse")))).as("evs"))
      .withColumn("o", explode(expr(foldExpr)))
      .select(col("schema_name"), col("table_name"),
        col("o.tick").as("tick"), col("o.kind").as("kind"),
        col("o.disp").as("disp"), col("o.ts").as("ts"),
        col("o.decision").as("decision"), col("o.sid").as("sid"),
        col("o.n_subs").as("n_subs"), col("o.n_disp").as("n_disp"),
        col("o.died").as("died"))

  /** A106 production query: the scripted registration storm over every
    * table in the changefeed. */
  def subReuse(cl: DataFrame): DataFrame =
    subRegistryFrame(subTrace(cl))

  // ------------------------------------------------------------------
  // DuckDB oracle
  // ------------------------------------------------------------------

  /** Post-event subscription list per arm, shared by the recursive
    * step's columns (A92's repeated-CASE oracle discipline). */
  def subReuseSql(): String = {
    val cands = "list_filter(s.subs, x -> x.cp <= t.ts AND t.ts <= x.rts)"
    val reuseSid = s"list_min(list_transform($cands, x -> x.sid))"
    val unregSid =
      "list_filter(s.asg, a -> a.disp = t.disp)[1].sid"
    val unregNd =
      s"list_filter(s.subs, x -> x.sid = $unregSid)[1].nd"
    val subsAfter =
      s"""CASE
         |  WHEN t.kind = 'ADV' THEN list_transform(s.subs,
         |    x -> {'sid': x.sid, 'cp': x.cp,
         |          'rts': GREATEST(x.rts, t.ts), 'nd': x.nd})
         |  WHEN t.kind = 'REG' AND len($cands) > 0 THEN
         |    list_transform(s.subs, x -> {'sid': x.sid, 'cp': x.cp,
         |      'rts': x.rts,
         |      'nd': x.nd + CASE WHEN x.sid = $reuseSid THEN 1 ELSE 0 END})
         |  WHEN t.kind = 'REG' AND t.only_reuse = 1 THEN s.subs
         |  WHEN t.kind = 'REG' THEN list_append(s.subs,
         |    {'sid': s.nsid, 'cp': t.ts, 'rts': t.ts, 'nd': CAST(1 AS BIGINT)})
         |  ELSE list_filter(list_transform(s.subs,
         |    x -> {'sid': x.sid, 'cp': x.cp, 'rts': x.rts,
         |          'nd': x.nd - CASE WHEN x.sid = $unregSid THEN 1 ELSE 0 END}),
         |    x -> x.nd > 0)
         |END""".stripMargin
    s"""WITH RECURSIVE spans AS (
       |  SELECT schema_name, table_name,
       |    MIN(commit_ts) AS lo, MAX(commit_ts) AS hi
       |  FROM changelog GROUP BY 1, 2
       |), trace AS (
       |  SELECT schema_name, table_name, e.tick, e.kind, e.disp, e.ts,
       |    e.only_reuse
       |  FROM (
       |    SELECT schema_name, table_name, UNNEST([
       |      {'tick': 0, 'kind': 'REG',   'disp': 0, 'ts': lo,       'only_reuse': 0},
       |      {'tick': 1, 'kind': 'ADV',   'disp': -1, 'ts': lo + (2 * (hi - lo)) // 3, 'only_reuse': 0},
       |      {'tick': 2, 'kind': 'REG',   'disp': 1, 'ts': lo + (hi - lo) // 3, 'only_reuse': 0},
       |      {'tick': 3, 'kind': 'REG',   'disp': 2, 'ts': lo - 1,   'only_reuse': 0},
       |      {'tick': 4, 'kind': 'REG',   'disp': 3, 'ts': hi + 100, 'only_reuse': 1},
       |      {'tick': 5, 'kind': 'UNREG', 'disp': 1, 'ts': -1,       'only_reuse': 0},
       |      {'tick': 6, 'kind': 'UNREG', 'disp': 0, 'ts': -1,       'only_reuse': 0},
       |      {'tick': 7, 'kind': 'REG',   'disp': 4, 'ts': lo + (hi - lo) // 3, 'only_reuse': 0}]) AS e
       |    FROM spans)
       |), step AS (
       |  SELECT schema_name, table_name, CAST(-1 AS BIGINT) AS tick,
       |    CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS disp,
       |    CAST(NULL AS BIGINT) AS ts, CAST(NULL AS VARCHAR) AS decision,
       |    CAST(NULL AS BIGINT) AS sid, CAST(NULL AS BIGINT) AS n_subs,
       |    CAST(NULL AS BIGINT) AS n_disp, CAST(NULL AS BIGINT) AS died,
       |    CAST([] AS STRUCT(sid BIGINT, cp BIGINT, rts BIGINT, nd BIGINT)[])
       |      AS subs,
       |    CAST([] AS STRUCT(disp BIGINT, sid BIGINT)[]) AS asg,
       |    CAST(1 AS BIGINT) AS nsid
       |  FROM spans
       |  UNION ALL
       |  SELECT s.schema_name, s.table_name, CAST(t.tick AS BIGINT),
       |    t.kind, CAST(t.disp AS BIGINT), CAST(t.ts AS BIGINT),
       |    CASE
       |      WHEN t.kind = 'ADV' THEN 'advance'
       |      WHEN t.kind = 'REG' AND len($cands) > 0 THEN 'reuse'
       |      WHEN t.kind = 'REG' AND t.only_reuse = 1 THEN 'fail_only_reuse'
       |      WHEN t.kind = 'REG' THEN 'new'
       |      WHEN $unregNd = 1 THEN 'unreg_close'
       |      ELSE 'unreg' END,
       |    CAST(CASE
       |      WHEN t.kind = 'ADV' THEN -1
       |      WHEN t.kind = 'REG' AND len($cands) > 0 THEN $reuseSid
       |      WHEN t.kind = 'REG' AND t.only_reuse = 1 THEN -1
       |      WHEN t.kind = 'REG' THEN s.nsid
       |      ELSE $unregSid END AS BIGINT),
       |    CAST(len($subsAfter) AS BIGINT),
       |    CAST(COALESCE(list_sum(list_transform($subsAfter, x -> x.nd)), 0)
       |      AS BIGINT),
       |    CAST(CASE WHEN t.kind = 'UNREG' AND $unregNd = 1
       |      THEN 1 ELSE 0 END AS BIGINT),
       |    $subsAfter,
       |    CASE
       |      WHEN t.kind = 'REG' AND len($cands) > 0 THEN
       |        list_append(s.asg, {'disp': CAST(t.disp AS BIGINT),
       |          'sid': $reuseSid})
       |      WHEN t.kind = 'REG' AND t.only_reuse = 1 THEN s.asg
       |      WHEN t.kind = 'REG' THEN list_append(s.asg,
       |        {'disp': CAST(t.disp AS BIGINT), 'sid': s.nsid})
       |      WHEN t.kind = 'UNREG' THEN
       |        list_filter(s.asg, a -> a.disp != t.disp)
       |      ELSE s.asg END,
       |    CASE WHEN t.kind = 'REG' AND len($cands) = 0
       |      AND t.only_reuse = 0 THEN s.nsid + 1 ELSE s.nsid END
       |  FROM step s JOIN trace t
       |    ON s.schema_name = t.schema_name AND s.table_name = t.table_name
       |    AND t.tick = s.tick + 1
       |)
       |SELECT schema_name, table_name, tick, kind, disp, ts, decision,
       |  sid, n_subs, n_disp, died
       |FROM step WHERE tick >= 0""".stripMargin
  }
}
