package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A112/A113 replay-equality: the dynstream path-assignment handoff and
  * the subscription range-task fission, recounted by independent plain
  * Scala transcriptions of the reference loops. */
class DynstreamFissionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  test("A112: assignment = FastHash mod N and the handoff preserves per-path order") {
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val rows = cdc.DynStreamAssign.pathAssign(cl).collect()
    assert(rows.nonEmpty)
    // independent hash recount (types.go:89-92 FastHash = Low ^ High<<1)
    val paths = rows.map(r => (r.getAs[String]("schema_name"),
      r.getAs[String]("table_name"))).distinct
    for ((s, t) <- paths) {
      val low = graft.functions.Portable.hash60Long(s"$s.$t")
      val high = graft.functions.Portable.hash60Long(s"$s.$t#hi")
      val fh = low ^ (high << 1)
      val r = rows.find(x => x.getAs[String]("schema_name") == s &&
        x.getAs[String]("table_name") == t).get
      assert(r.getAs[Long]("fast_hash") == fh, s"$s.$t")
      assert(r.getAs[Long]("stream_old") ==
        java.lang.Math.floorMod(fh, cdc.DynStreamAssign.OldStreams.toLong))
      assert(r.getAs[Long]("stream_new") ==
        java.lang.Math.floorMod(fh, cdc.DynStreamAssign.NewStreams.toLong))
    }
    // the resize must actually migrate some paths and keep others
    val moved = paths.map { case (s, t) =>
      rows.find(x => x.getAs[String]("schema_name") == s &&
        x.getAs[String]("table_name") == t).get.getAs[Long]("moved")
    }
    assert(moved.contains(1L) && moved.contains(0L),
      "resize 4->6 should move some paths and keep others")
    // replay the stream.go:334-377 handoff per path: the former queue
    // (phase 0) drains fully, in arrival order, before direct events —
    // and that order must equal plain commit order (the invariant)
    for ((s, t) <- paths) {
      val evs = rows.filter(x => x.getAs[String]("schema_name") == s &&
        x.getAs[String]("table_name") == t)
      val byDrain = evs.sortBy(e => (e.getAs[Long]("phase"),
        e.getAs[Long]("commit_ts"), e.getAs[Long]("pk")))
      val byCommit = evs.sortBy(e => (e.getAs[Long]("commit_ts"),
        e.getAs[Long]("pk")))
      assert(byDrain.map(_.getAs[Long]("commit_ts")).toSeq ==
        byCommit.map(_.getAs[Long]("commit_ts")).toSeq, s"$s.$t reordered")
      assert(byDrain.zipWithIndex.forall { case (e, i) =>
        e.getAs[Long]("seq_in_path") == i + 1 }, s"$s.$t seq")
      assert(evs.forall(_.getAs[Long]("order_ok") == 1L), s"$s.$t order_ok")
    }
    // both phases of the handoff appear
    val phases = rows.map(_.getAs[Long]("phase")).toSet
    assert(phases == Set(0L, 1L), s"phases $phases")
  }

  test("A113: round-1 left-cover prefix + retry remainder + round-2 re-split tile the subscription exactly") {
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val rows = cdc.SubRangeTasks.rangeTasks(cl).collect()
    assert(rows.nonEmpty)
    val n = cdc.SubRangeTasks.NRegions.toLong
    val tables = rows.map(r => (r.getAs[String]("schema_name"),
      r.getAs[String]("table_name"))).distinct.sorted
    // independent bounds recount
    val bounds = cl.groupBy(col("schema_name"), col("table_name"))
      .agg(min(col("pk")).as("lo"), max(col("pk")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .toMap
    for (((s, t), rank) <- tables.zipWithIndex) {
      val (lo, hi) = bounds((s, t))
      val w = hi - lo + 1
      val subStart = lo + w / 8
      val subEnd = lo + 7 * w / 8
      val hole = 1 + rank % (n - 2)
      def b(k: Long) = lo + k * w / n
      val tr = rows.filter(r => r.getAs[String]("schema_name") == s &&
        r.getAs[String]("table_name") == t)
      assert(tr.forall(_.getAs[Long]("sub_id") == rank.toLong))
      // round 1: subscribe tasks are EXACTLY the gap-free prefix 0..hole-1
      // intersected with the subscription (CutRegionsLeftCoverSpan)
      val r1 = tr.filter(r => r.getAs[Long]("round") == 1L &&
        r.getAs[String]("status") == "subscribed")
      val wantR1 = (0L until hole).map(i =>
        (math.max(b(i), subStart), math.min(b(i + 1), subEnd)))
        .filter { case (a, e) => a < e }
      assert(r1.map(r => (r.getAs[Long]("task_start"),
        r.getAs[Long]("task_end"))).sorted.toSeq == wantR1.sorted, s"$s.$t r1")
      // exactly one retry remainder, covering [hole start, sub end)
      val rem = tr.filter(_.getAs[String]("status") == "retry_remainder")
      assert(rem.length == 1, s"$s.$t remainder count")
      assert(rem.head.getAs[Long]("task_start") == math.max(b(hole), subStart) &&
        rem.head.getAs[Long]("task_end") == subEnd, s"$s.$t remainder span")
      // round 2 exists iff the remainder is non-empty, and its epoch-2
      // rows are exactly the two split halves of the healed hole
      val r2 = tr.filter(r => r.getAs[Long]("round") == 2L)
      val halves = r2.filter(_.getAs[Long]("region_epoch") == 2L)
      val m = (b(hole) + b(hole + 1)) / 2
      assert(halves.map(r => (r.getAs[Long]("region_start"),
        r.getAs[Long]("region_end"))).sorted.toSeq ==
        Seq((b(hole), m), (m, b(hole + 1))).sorted, s"$s.$t split halves")
      // the full task set tiles the subscription span with no gap or
      // overlap (subscribe rows only)
      val tasks = tr.filter(_.getAs[String]("status") == "subscribed")
        .map(r => (r.getAs[Long]("task_start"), r.getAs[Long]("task_end")))
        .sorted
      assert(tasks.head._1 == subStart && tasks.last._2 == subEnd, s"$s.$t ends")
      tasks.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 == s2, s"$s.$t gap at $e1")
        case _ =>
      }
      // new region ids on the split (verID bump, :592)
      assert(halves.map(_.getAs[Long]("region_id")).sorted.toSeq ==
        Seq(rank * 100L + 50L, rank * 100L + 51L))
    }
  }

  test("A113: a degenerate single-pk span still yields at least one task") {
    // ADVICE r10: hi == lo collapsed sub_start == sub_end and the table
    // silently vanished from the task channel; sub_end now clamps to
    // sub_start + 1
    import spark.implicits._
    val cl = Seq(
      ("db0", "t_single", 42L, 100L),
      ("db0", "t_single", 42L, 101L),
      ("db0", "t_wide", 0L, 102L), ("db0", "t_wide", 63L, 103L))
      .toDF("schema_name", "table_name", "pk", "commit_ts")
    val tasks = cdc.SubRangeTasks.rangeTasks(cl).collect()
    val single = tasks.filter(_.getAs[String]("table_name") == "t_single")
    assert(single.nonEmpty, "degenerate span emitted zero tasks")
    assert(single.exists(_.getAs[String]("status") == "subscribed"))
    single.foreach { r =>
      assert(r.getAs[Long]("task_start") < r.getAs[Long]("task_end"))
    }
  }
}
