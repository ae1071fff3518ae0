package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A91 — the coordinator's changefeed retry/backoff state machine:
  * the error-driven lifecycle deciding when a failing changefeed
  * retries, when it turns `warning`, and when it is permanently
  * `failed`.
  *
  * Reference: coordinator/changefeed/backoff.go:31-39 (exponential
  * backoff constants: init 10s, multiplier 2, max interval 600s, a
  * 0.1 randomization factor modeled OUT for determinism — any value
  * in the band is semantically valid), :91-94 `ShouldRun` (not failed
  * AND now past nextRetryTime), :96-100 `shouldFailWhenRetry`
  * (NextBackOff returns Stop once MaxElapsedTime =
  * changefeedErrorStuckDuration has elapsed since the retry epoch
  * began), :110-150 `CheckStatus` (failed is STICKY and checked
  * first; a checkpoint advance while retrying resets the backoff and
  * returns the feed to normal; an error with no advance enters
  * HandleError), :161-199 `HandleError` (a GC-fast-fail /
  * should-fail error code fails the feed immediately; otherwise the
  * first retry resets the epoch, each retry takes the next
  * exponential interval, and exceeding MaxElapsedTime fails the
  * feed), and changefeed_db.go:208-224 `Resume(resetBackoff)` (a cli
  * resume clears the backoff state and reschedules).
  *
  * Deterministic replay: a fixed 21-tick heartbeat grid (one tick =
  * `TickSec` virtual seconds); each changefeed's per-tick checkpoint
  * is the cumulative changelog row count its table rules match below
  * the tick boundary, and its error/fast-fail/resume ticks come from
  * the fleet config. The per-changefeed fold is inherently
  * sequential, so it runs INSIDE Catalyst as a higher-order
  * `aggregate` over the sorted tick list (the A82 discipline): one
  * fleet-scale row per changefeed, no driver loop; the oracle
  * replays the identical fold as a recursive CTE.
  *
  * Scale shape: one partial-aggregated changelog pass builds the
  * (span, tick) counts; everything after is fleet × 21 rows. The
  * only window is the per-changefeed 21-row cumulative sum —
  * partitioned, bounded by the grid, never by data volume. */
object ChangefeedBackoff {

  /** One changefeed's scenario: table rules + deterministic error
    * schedule (-1 = never). Errors fire on ticks in [errFrom,
    * errTo]; `fastfailTick` raises a ShouldFailChangefeed-class
    * error; `resumeTick` is the cli Resume(resetBackoff=true). */
  case class BackoffCf(name: String, rules: Seq[String],
                       errFrom: Long = -1L, errTo: Long = -1L,
                       fastfailTick: Long = -1L, resumeTick: Long = -1L)

  /** Heartbeat grid: ticks 0..MaxTick, one tick = TickSec virtual
    * seconds; commit_ts below t*TickWidth counts toward the tick's
    * checkpoint. */
  val MaxTick = 20L
  val TickSec = 60L
  val TickWidth = 50L
  /** changefeedErrorStuckDuration (virtual seconds). */
  val MaxElapsedSec = 600L

  /** 10s·2^k capped at the 600s max interval (backoff.go:35-38),
    * generated as a literal ladder so both engines compute the exact
    * same integers. */
  private def ladderSql(k: String): String =
    (0 to 5).map(i => s"WHEN $k = $i THEN ${10L * (1L << i)}")
      .mkString("CASE ", " ", " ELSE 600 END")

  /** The per-changefeed sequential fold as a Catalyst `aggregate`
    * lambda over `evs` = sorted (tick, cp, kind) structs. State:
    * (failed, retrying, k, rs = retry-epoch start, ns = nextRetryTime,
    * cp, out rows). */
  private def foldExpr: String = {
    val now = "(e.tick * 60)"
    // ERR-arm shared sub-expressions, inlined per arm (no `let`)
    val k0 = "IF(acc.retrying, acc.k, CAST(0 AS BIGINT))"
    val rs0 = s"IF(acc.retrying, acc.rs, $now)"
    val itv = ladderSql(k0)
    val ns1 = s"($now + $itv)"
    def emit(state: String, k: String, itv: String, ns: String,
             run: String) =
      s"""named_struct('tick', e.tick, 'kind', e.kind, 'cp', acc.cp,
         |  'state', $state, 'k', CAST($k AS BIGINT),
         |  'interval_s', CAST($itv AS BIGINT), 'ns', CAST($ns AS BIGINT),
         |  'run', CAST($run AS BIGINT))""".stripMargin
    def emitCp(cp: String, state: String, k: String, itv: String,
               ns: String, run: String) =
      emit(state, k, itv, ns, run).replace("acc.cp", cp)
    s"""aggregate(
       |  evs,
       |  named_struct('failed', false, 'retrying', false,
       |    'k', CAST(0 AS BIGINT), 'rs', CAST(0 AS BIGINT),
       |    'ns', CAST(-1 AS BIGINT), 'cp', CAST(-1 AS BIGINT),
       |    'out', CAST(array() AS ARRAY<STRUCT<tick: BIGINT, kind: STRING,
       |      cp: BIGINT, state: STRING, k: BIGINT, interval_s: BIGINT,
       |      ns: BIGINT, run: BIGINT>>)),
       |  (acc, e) -> CASE
       |    WHEN e.kind = 'RESUME' THEN named_struct(
       |      'failed', false, 'retrying', false, 'k', CAST(0 AS BIGINT),
       |      'rs', CAST($now AS BIGINT), 'ns', CAST(-1 AS BIGINT),
       |      'cp', acc.cp,
       |      'out', concat(acc.out, array(${emit("'resumed'", "0", "0", "-1", "1")})))
       |    WHEN acc.failed THEN named_struct(
       |      'failed', true, 'retrying', acc.retrying, 'k', acc.k,
       |      'rs', acc.rs, 'ns', acc.ns, 'cp', acc.cp,
       |      'out', concat(acc.out, array(${emit("'failed'", "acc.k", "0", "acc.ns", "0")})))
       |    WHEN e.kind = 'ERR_FASTFAIL' THEN named_struct(
       |      'failed', true, 'retrying', acc.retrying, 'k', acc.k,
       |      'rs', acc.rs, 'ns', acc.ns, 'cp', acc.cp,
       |      'out', concat(acc.out, array(${emit("'failed'", "acc.k", "0", "acc.ns", "0")})))
       |    WHEN e.kind = 'ERR' THEN
       |      IF(($now - $rs0) > $MaxElapsedSec,
       |        named_struct(
       |          'failed', true, 'retrying', true, 'k', ($k0) + 1,
       |          'rs', CAST($rs0 AS BIGINT), 'ns', CAST($ns1 AS BIGINT),
       |          'cp', acc.cp,
       |          'out', concat(acc.out, array(${emit("'failed'", s"($k0) + 1", itv, ns1, "0")}))),
       |        named_struct(
       |          'failed', false, 'retrying', true, 'k', ($k0) + 1,
       |          'rs', CAST($rs0 AS BIGINT), 'ns', CAST($ns1 AS BIGINT),
       |          'cp', acc.cp,
       |          'out', concat(acc.out, array(${emit("'warning'", s"($k0) + 1", itv, ns1, "0")}))))
       |    WHEN e.cp > acc.cp AND acc.retrying THEN named_struct(
       |      'failed', false, 'retrying', false, 'k', CAST(0 AS BIGINT),
       |      'rs', CAST($now AS BIGINT), 'ns', CAST(-1 AS BIGINT), 'cp', e.cp,
       |      'out', concat(acc.out, array(${emitCp("e.cp", "'normal'", "0", "0", "-1", "1")})))
       |    WHEN e.cp > acc.cp THEN named_struct(
       |      'failed', false, 'retrying', false, 'k', acc.k,
       |      'rs', acc.rs, 'ns', acc.ns, 'cp', e.cp,
       |      'out', concat(acc.out, array(${emitCp("e.cp", "'normal'", "acc.k",
                "0", "acc.ns", s"IF($now > acc.ns, 1, 0)")})))
       |    ELSE named_struct(
       |      'failed', false, 'retrying', acc.retrying, 'k', acc.k,
       |      'rs', acc.rs, 'ns', acc.ns, 'cp', acc.cp,
       |      'out', concat(acc.out, array(${emit(
                "IF(acc.retrying, 'warning', 'normal')", "acc.k", "0",
                "acc.ns", s"IF($now > acc.ns, 1, 0)")})))
       |  END,
       |  acc -> acc.out)""".stripMargin
  }

  /** Core frame, spec-drivable: `trace` = (changefeed, tick, cp,
    * kind) — one row per heartbeat with its cumulative checkpoint and
    * event kind. Output: one row per heartbeat with the machine's
    * verdict. */
  def backoffFrame(trace: DataFrame): DataFrame =
    trace
      .groupBy(col("changefeed"))
      .agg(sort_array(collect_list(struct(col("tick"), col("cp"),
        col("kind")))).as("evs"))
      .withColumn("o", explode(expr(foldExpr)))
      .select(col("changefeed"), col("o.tick").as("tick"),
        col("o.kind").as("kind"), col("o.cp").as("checkpoint"),
        col("o.state").as("state"), col("o.k").as("retry_k"),
        col("o.interval_s").as("interval_s"),
        col("o.ns").as("next_retry_s"), col("o.run").as("should_run"))

  /** The deterministic production trace: per changefeed, cumulative
    * rule-matched row counts below each tick boundary + the config's
    * error/fast-fail/resume schedule. */
  def trace(cl: DataFrame, fleet: Seq[BackoffCf]): DataFrame = {
    val spark = cl.sparkSession
    import spark.implicits._
    val cfg = fleet.map(c => (c.name, c.errFrom, c.errTo,
      c.fastfailTick, c.resumeTick)).toDF(
      "changefeed", "err_from", "err_to", "ff_tick", "res_tick")
    val defs = fleet.flatMap(c => c.rules.map(r => (c.name, r)))
      .toDF("changefeed", "rule")
    val spanCnt = cl
      .filter(expr(s"commit_ts div $TickWidth") < MaxTick)
      .groupBy(
        concat_ws(".", col("schema_name"), col("table_name")).as("span"),
        (expr(s"commit_ts div $TickWidth") + 1L).as("tick"))
      .agg(count(lit(1)).as("cnt"))
    val perCf = defs.join(spanCnt, expr("span LIKE rule"))
      .select(col("changefeed"), col("span"), col("tick"), col("cnt"))
      .distinct() // a span matching two rules of one cf counts once
      .groupBy(col("changefeed"), col("tick"))
      .agg(sum(col("cnt")).as("cnt"))
    val grid = cfg.select(col("changefeed"),
      explode(expr(s"sequence(0L, ${MaxTick}L)")).as("tick"))
    val wcum = Window.partitionBy(col("changefeed")).orderBy(col("tick"))
    grid.join(perCf, Seq("changefeed", "tick"), "left")
      .withColumn("cp", sum(coalesce(col("cnt"), lit(0L))).over(wcum))
      .join(cfg, Seq("changefeed"))
      .select(col("changefeed"), col("tick"), col("cp"),
        when(col("tick") === col("res_tick"), "RESUME")
          .when(col("tick") === col("ff_tick"), "ERR_FASTFAIL")
          .when(col("tick").between(col("err_from"), col("err_to")), "ERR")
          .otherwise("HB").as("kind"))
  }

  /** A91 production query. */
  def backoff(cl: DataFrame, fleet: Seq[BackoffCf]): DataFrame =
    backoffFrame(trace(cl, fleet))

  def backoffSql(fleet: Seq[BackoffCf]): String = {
    val cfgRows = fleet.map(c =>
      s"('${c.name}', CAST(${c.errFrom} AS BIGINT), CAST(${c.errTo} AS BIGINT), " +
        s"CAST(${c.fastfailTick} AS BIGINT), CAST(${c.resumeTick} AS BIGINT))")
      .mkString(", ")
    val defRows = fleet.flatMap(c => c.rules.map(r => s"('${c.name}', '$r')"))
      .mkString(", ")
    val k0 = "CASE WHEN s.retrying THEN s.k ELSE 0 END"
    val rs0 = s"CASE WHEN s.retrying THEN s.rs ELSE now END"
    val itv = ladderSql(s"($k0)")
    s"""WITH RECURSIVE cfg(changefeed, err_from, err_to, ff_tick, res_tick) AS (
       |  VALUES $cfgRows
       |), defs(changefeed, rule) AS (
       |  VALUES $defRows
       |), spancnt AS (
       |  SELECT schema_name || '.' || table_name AS span,
       |    commit_ts // $TickWidth + 1 AS tick, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM changelog WHERE commit_ts // $TickWidth < $MaxTick
       |  GROUP BY 1, 2
       |), percf AS (
       |  SELECT changefeed, tick, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM (SELECT DISTINCT d.changefeed, s.span, s.tick, s.cnt
       |        FROM defs d JOIN spancnt s ON s.span LIKE d.rule)
       |  GROUP BY changefeed, tick
       |), grid AS (
       |  SELECT c.changefeed, g.tick
       |  FROM cfg c CROSS JOIN
       |    (SELECT UNNEST(GENERATE_SERIES(0, $MaxTick)) AS tick) g
       |), tr AS (
       |  SELECT g.changefeed, g.tick,
       |    CAST(SUM(COALESCE(p.cnt, 0)) OVER (PARTITION BY g.changefeed
       |      ORDER BY g.tick) AS BIGINT) AS cp,
       |    CASE WHEN g.tick = c.res_tick THEN 'RESUME'
       |         WHEN g.tick = c.ff_tick THEN 'ERR_FASTFAIL'
       |         WHEN g.tick BETWEEN c.err_from AND c.err_to THEN 'ERR'
       |         ELSE 'HB' END AS kind
       |  FROM grid g
       |  LEFT JOIN percf p ON p.changefeed = g.changefeed AND p.tick = g.tick
       |  JOIN cfg c ON c.changefeed = g.changefeed
       |), step AS (
       |  SELECT changefeed, CAST(-1 AS BIGINT) AS tick, FALSE AS failed,
       |    FALSE AS retrying, CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS rs,
       |    CAST(-1 AS BIGINT) AS ns, CAST(-1 AS BIGINT) AS cp,
       |    CAST(NULL AS VARCHAR) AS e_kind, CAST(NULL AS VARCHAR) AS e_state,
       |    CAST(NULL AS BIGINT) AS e_cp, CAST(NULL AS BIGINT) AS e_k,
       |    CAST(NULL AS BIGINT) AS e_itv, CAST(NULL AS BIGINT) AS e_ns,
       |    CAST(NULL AS BIGINT) AS e_run
       |  FROM cfg
       |  UNION ALL
       |  SELECT changefeed, tick,
       |    CASE arm WHEN 'resume' THEN FALSE WHEN 'failed' THEN TRUE
       |      WHEN 'fastfail' THEN TRUE WHEN 'err_stop' THEN TRUE
       |      ELSE FALSE END,
       |    CASE arm WHEN 'resume' THEN FALSE
       |      WHEN 'err_stop' THEN TRUE WHEN 'err_retry' THEN TRUE
       |      WHEN 'adv_clear' THEN FALSE WHEN 'adv' THEN FALSE
       |      ELSE retrying END,
       |    CAST(CASE arm WHEN 'resume' THEN 0 WHEN 'adv_clear' THEN 0
       |      WHEN 'err_stop' THEN k1 WHEN 'err_retry' THEN k1
       |      ELSE k END AS BIGINT),
       |    CAST(CASE arm WHEN 'resume' THEN now WHEN 'adv_clear' THEN now
       |      WHEN 'err_stop' THEN rs1 WHEN 'err_retry' THEN rs1
       |      ELSE rs END AS BIGINT),
       |    CAST(CASE arm WHEN 'resume' THEN -1 WHEN 'adv_clear' THEN -1
       |      WHEN 'err_stop' THEN ns1 WHEN 'err_retry' THEN ns1
       |      ELSE ns END AS BIGINT),
       |    CAST(CASE WHEN arm IN ('adv_clear', 'adv') THEN e_cp0
       |      ELSE cp END AS BIGINT),
       |    e_kind0,
       |    CASE arm WHEN 'resume' THEN 'resumed'
       |      WHEN 'failed' THEN 'failed' WHEN 'fastfail' THEN 'failed'
       |      WHEN 'err_stop' THEN 'failed' WHEN 'err_retry' THEN 'warning'
       |      WHEN 'adv_clear' THEN 'normal' WHEN 'adv' THEN 'normal'
       |      ELSE CASE WHEN retrying THEN 'warning' ELSE 'normal' END END,
       |    CAST(CASE WHEN arm IN ('adv_clear', 'adv') THEN e_cp0
       |      ELSE cp END AS BIGINT),
       |    CAST(CASE arm WHEN 'resume' THEN 0 WHEN 'adv_clear' THEN 0
       |      WHEN 'err_stop' THEN k1 WHEN 'err_retry' THEN k1
       |      ELSE k END AS BIGINT),
       |    CAST(CASE WHEN arm IN ('err_stop', 'err_retry') THEN itv
       |      ELSE 0 END AS BIGINT),
       |    CAST(CASE arm WHEN 'resume' THEN -1 WHEN 'adv_clear' THEN -1
       |      WHEN 'err_stop' THEN ns1 WHEN 'err_retry' THEN ns1
       |      ELSE ns END AS BIGINT),
       |    CAST(CASE arm WHEN 'resume' THEN 1
       |      WHEN 'failed' THEN 0 WHEN 'fastfail' THEN 0
       |      WHEN 'err_stop' THEN 0 WHEN 'err_retry' THEN 0
       |      WHEN 'adv_clear' THEN 1
       |      ELSE CASE WHEN now > ns THEN 1 ELSE 0 END END AS BIGINT)
       |  FROM (
       |    SELECT s.changefeed, s.failed, s.retrying, s.k, s.rs, s.ns, s.cp,
       |      t.tick AS tick, t.kind AS e_kind0, t.cp AS e_cp0,
       |      t.tick * $TickSec AS now,
       |      CASE WHEN s.retrying THEN s.k ELSE 0 END + 1 AS k1,
       |      $rs0 AS rs1, (now + $itv) AS ns1, $itv AS itv,
       |      CASE
       |        WHEN t.kind = 'RESUME' THEN 'resume'
       |        WHEN s.failed THEN 'failed'
       |        WHEN t.kind = 'ERR_FASTFAIL' THEN 'fastfail'
       |        WHEN t.kind = 'ERR' AND (now - ($rs0)) > $MaxElapsedSec
       |          THEN 'err_stop'
       |        WHEN t.kind = 'ERR' THEN 'err_retry'
       |        WHEN t.cp > s.cp AND s.retrying THEN 'adv_clear'
       |        WHEN t.cp > s.cp THEN 'adv'
       |        ELSE 'hold' END AS arm
       |    FROM step s JOIN tr t
       |      ON t.changefeed = s.changefeed AND t.tick = s.tick + 1
       |  ) x
       |)
       |SELECT changefeed, tick, e_kind AS kind, e_cp AS checkpoint,
       |  e_state AS state, e_k AS retry_k, e_itv AS interval_s,
       |  e_ns AS next_retry_s, e_run AS should_run
       |FROM step WHERE tick >= 0""".stripMargin
  }
}
