package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantics checks for every SparkEntry query on sf0.001. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  // SlowTest: ~2 min of pure breadth (all 237 queries once). The driver's
  // own Verify + DuckDB oracle gate runs every declared query with full
  // result checking each round, and the rest of this spec still
  // exercises the per-family shapes — the fast suite keeps those.
  test("every declared query runs and returns rows", SlowTest) {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has matching oracle columns sorted consistently") {
    // each oracleSql key must exist in queries
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("changelog op/image semantics") {
    val cl = cdc.ChangeEvents.changelog(spark, dir).cache()
    import org.apache.spark.sql.functions._
    assert(cl.filter(col("op") === "I" && col("before_value").isNotNull).count() == 0)
    assert(cl.filter(col("op") === "D" && col("after_value").isNotNull).count() == 0)
    assert(cl.filter(col("op") === "U")
      .filter(col("before_value").isNull || col("after_value").isNull).count() == 0)
    // commit_ts unique
    assert(cl.select("commit_ts").distinct().count() == cl.count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("B26: streaks recount naively for a sample user; islands are maximal") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qGapsIslands(spark, dir).cache()
    assert(got.count() > 0)
    // naive per-user recount over collected day sets for 5 users
    val days = graft.util.Tables.events(spark, dir)
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    got.orderBy("user_id").limit(5).collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      val ds = days(u)
      val streaks = ds.foldLeft(List.empty[(Long, Long)]) { // (start, len)
        case (acc, d) => acc match {
          case (s, l) :: t if s + l == d => (s, l + 1) :: t
          case _ => (d, 1L) :: acc
        }
      }.reverse
      assert(r.getAs[Long]("n_active_days") == ds.length.toLong, s"user $u")
      assert(r.getAs[Long]("n_streaks") == streaks.length.toLong, s"user $u")
      val best = streaks.minBy { case (s, l) => (-l, s) }
      assert(r.getAs[Long]("longest_streak") == best._2, s"user $u")
      assert(r.getAs[Long]("longest_streak_start") == best._1, s"user $u")
    }
  }

  test("B25: the single-shuffle identity plan equals Spark's literal set ops") {
    import org.apache.spark.sql.functions._
    // the query computes INTERSECT ALL / EXCEPT ALL via the bag
    // identities (min / positive difference of multiplicities); the
    // semantic anchor is Spark's own intersectAll/exceptAll operators
    // producing the identical (key, multiplicity, op) bag
    val o = graft.util.Tables.orders(spark, dir)
    def keys(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    val a = keys(1996); val b = keys(1997)
    def literal(df: org.apache.spark.sql.DataFrame, op: String) =
      df.groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
        .withColumn("op", lit(op))
    val want = literal(a.intersectAll(b), "intersect_all")
      .unionByName(literal(a.exceptAll(b), "except_all"))
      .unionByName(literal(b.exceptAll(a), "except_all_rev"))
    val got = queries.Analytics.qSetOps(spark, dir).cache()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // rows only appear where the rule yields a positive multiplicity
    assert(got.filter(col("multiplicity") <= 0).count() == 0)
    assert(got.select("op").distinct().count() == 3)
    got.unpersist()
  }

  test("B24: grid median equals Spark's exact percentile; mode equals the naive argmax") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qMedianMode(spark, dir).cache()
    // lo+hi over the grid == 2 * exact interpolated median (percentile
    // runs a per-group sort — the small-data oracle, not the scale plan)
    val want = graft.util.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(qty, 0.5) * 2").as("m2"), count(lit(1)).as("n"))
    val j = got.join(want, "l_returnflag").cache()
    assert(j.count() == 3)
    assert(j.filter(col("median_qty_x2").cast("double") =!= col("m2")).count() == 0)
    assert(j.filter(col("n_rows") =!= col("n")).count() == 0)
    // naive mode with the same smallest-value tie-break
    val naive = graft.util.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("c"))
      .groupBy("l_returnflag")
      .agg(min_by(struct(col("qty"), col("c")), struct(-col("c"), col("qty"))).as("s"))
      .select(col("l_returnflag"), col("s.qty").as("want_mode"), col("s.c").as("want_cnt"))
    val jm = got.join(naive, "l_returnflag")
    assert(jm.filter(col("mode_qty") =!= col("want_mode") ||
      col("mode_count") =!= col("want_cnt")).count() == 0)
  }

  test("B27: rolling distinct equals the brute-force trailing-window recount") {
    val got = queries.Analytics.qRollingDistinct(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = graft.util.Tables.events(spark, dir)
      .selectExpr("user_id", "(ts div 1000) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val maxDay = raw.map(_._2).max
    assert(got.nonEmpty && got.keySet.max == maxDay)
    for (d <- got.keySet) {
      val want7 = raw.filter(p => p._2 <= d && p._2 > d - 7).map(_._1).distinct.length
      val want1 = raw.filter(_._2 == d).map(_._1).distinct.length
      assert(got(d) == (want7.toLong, want1.toLong), s"day $d: ${got(d)}")
    }
  }

  test("B28: the sampled gauge equals the brute-force interval stab count") {
    val durUs = 300000000L; val gridUs = 60000000L
    val got = queries.Analytics.qConcurrencyGauge(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ivs = graft.util.Tables.events(spark, dir)
      .selectExpr("ts div 1000 AS s", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.nonEmpty)
    // spot-check a deterministic sample of sampled minutes exactly
    val sample = got.keySet.toSeq.sorted
    for (m <- sample.take(5) ++ sample.takeRight(5) ++
        sample.drop(sample.size / 2).take(5)) {
      val b = m * gridUs
      val stab = ivs.filter(iv => iv._1 <= b && b < iv._1 + durUs)
      assert(got(m)._1 == stab.length.toLong, s"minute $m count")
      assert(got(m)._2 == stab.map(_._2).distinct.length.toLong, s"minute $m types")
    }
    // conservation: every event contributes exactly its covered-minute
    // count, bounded by the constant amplification dur/grid + 1
    val totalRows = got.values.map(_._1).sum
    val wantRows = ivs.map { case (s, _) =>
      (s + durUs - 1) / gridUs - (s + gridUs - 1) / gridUs + 1 }.sum
    assert(totalRows == wantRows)
    assert(ivs.forall { case (s, _) =>
      ((s + durUs - 1) / gridUs - (s + gridUs - 1) / gridUs + 1) <=
        durUs / gridUs + 1 })
  }

  test("B29: the range frame equals the brute-force trailing-interval recount") {
    val winUs = 3600000000L
    val got = queries.Analytics.qRangeFrame(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    val evs = graft.util.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "ts div 1000 AS ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100.0)))
    assert(got.nonEmpty && got.size == evs.length)
    val byUser = evs.groupBy(_._1)
    // every row's frame: all of the user's events inside the trailing
    // interval, ts-ties included as PEERS (equal-ts rows share a frame)
    for ((u, rows) <- byUser; r <- rows) {
      val frame = rows.filter(e => e._3 <= r._3 && e._3 >= r._3 - winUs)
      assert(got((u, r._2)) == (frame.map(_._4).sum, frame.length.toLong),
        s"user $u event ${r._2}")
    }
  }

  test("B31: unpivot of the pivot matrix is the identity on the direct long-form aggregate") {
    import org.apache.spark.sql.functions._
    val long = graft.queries.Analytics.qUnpivot(spark, dir)
    val direct = graft.util.Tables.events(spark, dir)
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"), col("event_type"))
      .groupBy("user_id", "day", "event_type").agg(count(lit(1)).as("n"))
    assert(long.exceptAll(direct).count() == 0 &&
      direct.exceptAll(long).count() == 0,
      "unpivot(pivot(x)) must equal the direct aggregate")
    // zero cells of the wide matrix are dropped, not emitted
    assert(long.filter(col("n") === 0L).count() == 0)
  }

  test("C58: drift deltas recount from raw batch shares and flag at the threshold") {
    import org.apache.spark.sql.functions._
    val f = graft.ops.Corpus.corpusDrift(spark, dir).cache()
    assert(f.count() > 0)
    // independent recount of one dimension
    val docs = graft.util.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0) % 2, r.getString(1)))
    val tot = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val bySrc = docs.groupBy(_._2)
    f.filter(col("dim") === "source").collect().foreach { r =>
      val v = r.getString(1)
      val oldN = bySrc.getOrElse(v, Array()).count(_._1 == 0L).toLong
      val newN = bySrc.getOrElse(v, Array()).count(_._1 == 1L).toLong
      assert(r.getLong(2) == oldN && r.getLong(3) == newN, s"$v counts")
      assert(r.getLong(4) == oldN * 1000000L / tot(0L))
      assert(r.getLong(5) == newN * 1000000L / tot(1L))
      assert(r.getLong(6) == r.getLong(5) - r.getLong(4))
      assert(r.getLong(7) ==
        (if (math.abs(r.getLong(6)) >= 20000L) 1L else 0L))
    }
    // batch totals agree regardless of which dimension counted them
    assert(f.filter(col("dim") === "lang").agg(sum("old_n")).head().getLong(0)
      == tot(0L))
    f.unpersist()
  }

  test("B34: shares are exact floor ratios that close to one within truncation loss") {
    import org.apache.spark.sql.functions._
    val f = graft.queries.Analytics.qShareOfTotal(spark, dir).cache()
    val n = f.count()
    assert(n > 0)
    // per region: shares sum to 1e6 minus at most (rows-1) of floor loss
    val byRegion = f.groupBy("r_name")
      .agg(sum("region_share_ppm").as("s"), count(lit(1)).as("k")).collect()
    byRegion.foreach { r =>
      val (s, k) = (r.getLong(1), r.getLong(2))
      assert(s <= 1000000L && s > 1000000L - k, s"region ${r.getString(0)}: $s")
    }
    val totalS = f.agg(sum("total_share_ppm")).head().getLong(0)
    assert(totalS <= 1000000L && totalS > 1000000L - n)
    // ratios recompute exactly from the revenue column
    val bad = f.withColumn("tot",
        sum("rev_cents").over(org.apache.spark.sql.expressions.Window.partitionBy("r_name")))
      .filter(col("region_share_ppm") =!=
        expr("rev_cents * 1000000 div tot")).count()
    assert(bad == 0)
    f.unpersist()
  }

  test("B33: the HLL estimate meets its tolerance and the exact counts recount") {
    import org.apache.spark.sql.functions._
    val f = graft.queries.Analytics.qApproxDistinct(spark, dir)
    val rows = f.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    // every group's sketch lands inside the contract tolerance
    assert(rows.values.forall(_._2 == 1L), rows.toString)
    // the exact side recounts against a direct distinct
    val direct = graft.util.Tables.events(spark, dir)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map { case (k, (v, _)) => k -> v } == direct)
  }

  test("B32: full outer preserves both unmatched sides with the sentinel discipline") {
    import org.apache.spark.sql.functions._
    val f = graft.queries.Analytics.qFullOuter(spark, dir).cache()
    val arms = f.groupBy("presence").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("both", "catalog_only", "shipped_only").subsetOf(arms.keySet),
      s"all three presence arms must populate: $arms")
    // sentinels exactly on the absent side, never on the present one
    assert(f.filter(col("presence") === "shipped_only" &&
      col("price_cents") =!= -1L).count() == 0)
    assert(f.filter(col("presence") === "catalog_only" &&
      (col("bulk_qty") =!= -1L || col("n_bulk_items") =!= -1L)).count() == 0)
    assert(f.filter(col("presence") === "both" &&
      (col("price_cents") === -1L || col("bulk_qty") === -1L)).count() == 0)
    // partkey is unique — a full outer never duplicates a key
    assert(f.groupBy("partkey").count().filter(col("count") > 1L).count() == 0)
    f.unpersist()
  }

  test("C51: heavy hitters equal the brute-force document-frequency top-k") {
    val n = 5; val k = 50
    val got = ops.Corpus.ngramHeavyHitters(spark, dir, n, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val docs = graft.util.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val df = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { text =>
      val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
      toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        .distinct.foreach(g => df(g) += 1L)
    }
    val want = df.toSeq.filter(_._2 >= 2L)
      .sortBy { case (g, c) => (-c, g) }.take(k)
    assert(got.map(r => (r._1, r._2)).toSeq == want,
      s"${got.take(3).toSeq} vs ${want.take(3)}")
    assert(got.map(_._3).toSeq == (1L to got.length.toLong))
  }

  test("B30: JSON extraction aggregates equal the parsed-column recount") {
    val got = queries.Analytics.qJsonExtract(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.nonEmpty)
    val evs = graft.util.Tables.events(spark, dir)
      .select("event_type", "user_id", "value", "props").collect()
      .map { r =>
        val m = """"k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(r.getString(3))
          .getOrElse(sys.error(s"unparseable props: ${r.getString(3)}"))
        (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100.0),
          m.group(1).toLong)
      }
    val want = evs.groupBy(e => (e._1, e._4 / 10)).map { case (key, g) =>
      key -> (g.length.toLong, g.map(_._3).sum, g.map(_._2).distinct.length.toLong,
        g.map(_._4).min, g.map(_._4).max) }
    assert(got == want)
  }

  test("C52: the bloom filter never misses a duplicate and verdicts partition") {
    val got = ops.Dedup.dedupBloom(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(got.nonEmpty)
    // sequential reference: positions from the same salted portable hash
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def fp(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(text.toLowerCase.replaceAll("\\s+", " ").trim
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = graft.util.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), fp(r.getString(1))))
    // m derived from the corpus count, as the op does (floor keeps the
    // small-SF geometry identical to the fixed-2^16 rounds)
    val mBits = ops.Dedup.bloomBitsFor(docs.length.toLong)
    assert(mBits == ops.Dedup.BloomBitsFloor ||
      16L * docs.length > ops.Dedup.BloomBitsFloor)
    def positions(f: String): Seq[Long] =
      (0 until ops.Dedup.BloomK).map(i => hash60(s"bloom$i:$f") % mBits)
    val hist = docs.filter(_._1 % 3 != 0)
    val bloomBits = hist.flatMap(d => positions(d._2)).toSet
    val histFps = hist.map(_._2).toSet
    val incoming = docs.filter(_._1 % 3 == 0)
    assert(incoming.length == got.size)
    incoming.foreach { case (id, f) =>
      val hits = positions(f).count(bloomBits)
      val pos = hits == ops.Dedup.BloomK
      val dup = histFps(f)
      val verdict = if (dup) "dup" else if (pos) "false_positive" else "new"
      assert(got(id) == (hits.toLong, if (pos) 1L else 0L,
        if (dup) 1L else 0L, verdict), s"doc $id")
      // the sketch's contract: NO false negatives, ever
      if (dup) assert(pos, s"doc $id: exact dup missed by the bloom")
    }
    // the sketch earns its keep: the overwhelming share of non-dups
    // are filtered without touching the exact set
    val nonDup = got.values.filter(_._3 == 0L)
    if (nonDup.size >= 20)
      assert(nonDup.count(_._4 == "false_positive") * 5 <= nonDup.size,
        "false-positive rate out of range for this geometry")
  }

  test("C50: the epoch plan conserves the token budget and flags repeats") {
    val budgetX = 4L
    val rows = ops.Corpus.mixEpochPlan(spark, dir, budgetX).collect()
    assert(rows.nonEmpty)
    val tokens = rows.map(_.getAs[Long]("tokens")).sum
    val target = rows.map(_.getAs[Long]("target_tokens")).sum
    // truncating division loses < 1 token per cell at each of the two
    // division stages (target_ppm, target_tokens)
    val budget = budgetX * tokens
    assert(target <= budget && budget - target <= 2L * budget / 1000L + rows.length,
      s"target $target vs budget $budget")
    rows.foreach { r =>
      val t = r.getAs[Long]("tokens"); val tt = r.getAs[Long]("target_tokens")
      val e = r.getAs[Long]("epochs_x1000"); val f = r.getAs[Long]("full_epochs")
      val tail = r.getAs[Long]("tail_ppm"); val rep = r.getAs[Long]("repeated")
      assert(e == tt * 1000L / math.max(t, 1L))
      assert(f == e / 1000L)
      assert(tail == (tt - f * t) * 1000000L / math.max(t, 1L))
      assert(rep == (if (e > 1000L) 1L else 0L))
      // a repeated cell really needs more than one pass of its data
      if (rep == 1L) assert(tt > t)
    }
  }

  test("B40: leave-one-out means recount and exclude the row's own value") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qLeaveOneOut(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    val hist = graft.util.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2)
    hist.foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { case (ok, _, cents) =>
        val g = got(ok)
        val want = if (rows.length == 1) -1L
          else (total - cents) * 1000000L / (rows.length - 1)
        assert(g.getAs[Long]("loo_mean_microcents") == want, s"order $ok")
        assert(g.getAs[Long]("n_orders") == rows.length.toLong)
      }
    }
    // the sentinel arm is real at this SF or the guard is untested
    assert(got.values.exists(_.getAs[Long]("loo_mean_microcents") >= 0L))
  }

  test("C64: audio windows tile with the declared overlap and digests recount") {
    import org.apache.spark.sql.functions._
    val win = 50L; val hop = 30L
    val got = ops.Multimodal.audioSegments(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(got.nonEmpty)
    // only audio rows segment
    got.keys.foreach(id => assert(id % 3 == 1, s"doc $id is not audio"))
    val texts = graft.util.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, segs) =>
      val nf = texts(id).getBytes("UTF-8").length / 4
      val ord = segs.sortBy(_.getAs[Int]("seg_no"))
      val wantSegs = 1 + (math.max(0, nf - win) + hop - 1) / hop
      assert(ord.length.toLong == wantSegs, s"doc $id")
      ord.zipWithIndex.foreach { case (s, i) =>
        assert(s.getAs[Long]("frame_start") == i * hop)
        assert(s.getAs[Long]("frame_end") ==
          math.min(i * hop + win, nf.toLong))
        assert(s.getAs[Long]("seg_ms_start") == i * hop * 10L)
      }
      // consecutive windows overlap by exactly win - hop frames
      // (except a short tail); the union covers [0, nf)
      assert(ord.last.getAs[Long]("frame_end") == nf.toLong)
      // digest recount for the first window
      val s0 = ord.head
      val bytes = texts(id).getBytes("UTF-8")
      val to = (s0.getAs[Long]("frame_end") * 4).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(java.util.Arrays.copyOfRange(bytes, 0, to))
        .take(8).map(b => f"$b%02x").mkString
      assert(s0.getAs[Long]("seg_digest") ==
        java.lang.Long.parseLong(hex.substring(0, 15), 16), s"doc $id digest")
    }
  }

  test("C65: pieces concatenate back to the word and equal a rank-order fold replay") {
    import org.apache.spark.sql.functions._
    val nMerges = 8
    val got = ops.Corpus.bpeSegment(spark, dir, nMerges).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    assert(got.nonEmpty)
    // reconstruct the merge table exactly as the operator derives it
    val words = graft.util.Tables.documents(spark, dir)
      .select(explode(ops.Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = words.toSeq.flatMap { case (w, f) =>
      w.sliding(2).map(p => (p(0).toString, p(1).toString) -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case ((l, r), c) => (-c, l, r) }.take(nMerges).map(_._1)
    got.foreach { case (w, row) =>
      // transcription fold: symbols start as chars; each merge in rank
      // order rewrites left-to-right non-overlapping
      var syms = w.map(_.toString).toVector
      pairs.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r)
            out(out.length - 1) = l + r
          else out += s
        }
        syms = out.toVector
      }
      assert(row.getAs[String]("pieces") == syms.mkString(" "), s"word $w")
      assert(row.getAs[Long]("n_pieces") == syms.length.toLong)
      assert(row.getAs[String]("pieces").replace(" ", "") == w)
      assert(row.getAs[Long]("freq") == words(w))
    }
    // the table is non-trivial: some word actually merged
    assert(got.values.exists(r =>
      r.getAs[Long]("n_pieces") < r.getAs[Long]("n_chars")))
  }

  test("C67: calibration equalizes per-source keep rates that raw thresholds skew") {
    val topPpm = 500000L
    val rows = ops.TextAnalysis.qualityCalibration(spark, dir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.size > 1)
    // cal_ppm recounts as the within-source cume_dist of the score
    bySrc.foreach { case (src, rs) =>
      val scores = rs.map(_.getAs[Long]("score")).sorted
      rs.foreach { r =>
        val want = scores.count(_ <= r.getAs[Long]("score")).toLong *
          1000000L / scores.length
        assert(r.getAs[Long]("cal_ppm") == want, s"$src doc ${r.get(0)}")
        assert((r.getAs[Long]("keep_cal") == 1L) ==
          (r.getAs[Long]("cal_ppm") > 1000000L - topPpm))
      }
    }
    // the calibrated keep rate is pinned near topPpm for EVERY source
    // (ties can only push a source's rate up off the exact grid)
    val calRates = bySrc.values.map(rs =>
      rs.count(_.getAs[Long]("keep_cal") == 1L).toDouble / rs.size)
    assert(calRates.forall(r => r >= 0.45 && r <= 0.65),
      s"calibrated rates drifted: $calRates")
    assert(calRates.max - calRates.min < 0.15,
      s"calibration failed to equalize: $calRates")
    // while the raw threshold's rates genuinely vary across sources
    val rawRates = bySrc.values.map(rs =>
      rs.count(_.getAs[Long]("keep_raw") == 1L).toDouble / rs.size)
    assert(rawRates.max - rawRates.min > 0.15,
      s"raw rates don't vary at this SF — the audit is vacuous: $rawRates")
  }

  test("B41: histogram conserves rows, edges tile the span, values sit in their buckets") {
    import org.apache.spark.sql.functions._
    val buckets = 20
    val rows = queries.Analytics.qHistogram(spark, dir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val cents = graft.util.Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0))
    assert(rows.map(_.getAs[Long]("n")).sum == cents.length.toLong)
    val (lo, hi) = (cents.min, cents.max)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cents") >= r.getAs[Long]("edge_lo_cents"))
      assert(r.getAs[Long]("max_cents") <= r.getAs[Long]("edge_hi_cents"))
    }
    // edges tile [lo, hi] exactly: first starts at lo, consecutive
    // buckets abut, last present bucket's edge reaches hi
    assert(rows.head.getAs[Long]("edge_lo_cents") == lo)
    rows.sliding(2).foreach {
      case Array(a, b) if b.getAs[Long]("bucket") ==
          a.getAs[Long]("bucket") + 1 =>
        assert(b.getAs[Long]("edge_lo_cents") ==
          a.getAs[Long]("edge_hi_cents") + 1)
      case _ =>
    }
    assert(rows.last.getAs[Long]("edge_hi_cents") >= hi)
    assert(rows.map(_.getAs[Long]("bucket")).forall(b =>
      b >= 0 && b < buckets))
  }

  test("C72: patches recount from the raster and conserve every payload byte") {
    import org.apache.spark.sql.functions._
    val p = 16
    val got = ops.Multimodal.patchGrid(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(got.nonEmpty)
    got.keys.foreach(id => assert(id % 3 == 0, s"doc $id is not image"))
    val docs = graft.util.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, patches) =>
      val bytes = docs(id).getBytes("UTF-8")
      val w = 64 + (id % 8).toInt * 32; val h = 64 + (id % 4).toInt * 32
      // byte conservation: every payload byte lands in exactly one patch
      assert(patches.map(_.getAs[Long]("patch_bytes")).sum ==
        math.min(bytes.length, w * h).toLong, s"doc $id")
      // digest recount for the first patch of each image
      val p0 = patches.minBy(r => (r.getAs[Int]("patch_row"),
        r.getAs[Int]("patch_col")))
      val assembled = (0 until math.min(p, h)).flatMap { rr =>
        val from = rr * w
        if (from < bytes.length)
          bytes.slice(from, math.min(from + p,
            math.min((rr + 1) * w, bytes.length)))
        else Nil
      }.toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(assembled).take(8).map(b => f"$b%02x").mkString
      assert(p0.getAs[Long]("patch_digest") ==
        java.lang.Long.parseLong(hex.substring(0, 15), 16), s"doc $id")
      // bounded amplification: never more than the full grid
      assert(patches.length <= ((w + p - 1) / p) * ((h + p - 1) / p))
    }
  }

  test("B43: new/returning split recounts from first-seen weeks and conserves actives") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qNewVsReturning(spark, dir).collect()
      .map(r => r.getAs[Long]("week_idx") -> r).toMap
    val act = graft.util.Tables.events(spark, dir)
      .select(col("user_id"),
        expr("((ts div 1000) div 86400000000) div 7").as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstSeen = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byWeek = act.groupBy(_._2)
    assert(got.keySet == byWeek.keySet)
    byWeek.foreach { case (w, rows) =>
      val r = got(w)
      val nNew = rows.count { case (u, _) => firstSeen(u) == w }.toLong
      assert(r.getAs[Long]("n_active") == rows.length.toLong)
      assert(r.getAs[Long]("n_new") == nNew, s"week $w")
      assert(r.getAs[Long]("n_returning") == rows.length - nNew)
      assert(r.getAs[Long]("returning_ppm") ==
        (rows.length - nNew) * 1000000L / rows.length)
    }
    // the first week is all-new; a later week has real returners
    val w0 = got(got.keySet.min)
    assert(w0.getAs[Long]("n_new") == w0.getAs[Long]("n_active"))
    assert(got.values.exists(_.getAs[Long]("n_returning") > 0L))
  }

  test("C77: transcripts replay the gap-fold sessionization and render in order") {
    import org.apache.spark.sql.functions._
    // a 1-day gap and maxTurns 3 at this sparse SF so multi-turn
    // sessions and the truncation arm both fire (production defaults
    // leave every sf0.001 session whole)
    val gapUs = 86400000000L; val maxTurns = 3
    val got = ops.Corpus.sessionTranscripts(spark, dir, gapUs, maxTurns)
      .collect().groupBy(_.getAs[Long]("user_id"))
    val ev = graft.util.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us")))
      .groupBy(_._1)
    assert(got.keySet == ev.keySet)
    ev.take(30).foreach { case (u, rows) =>
      val ord = rows.sortBy(r => (r._4, r._2))
      // gap-fold transcription: new session when silence > gapUs
      val sessions = scala.collection.mutable
        .ArrayBuffer.empty[Vector[(Long, String, Long)]]
      var prev = Long.MinValue
      ord.foreach { case (_, id, et, ts) =>
        if (prev == Long.MinValue || ts - prev > gapUs)
          sessions += Vector()
        sessions(sessions.length - 1) :+= ((id, et, ts))
        prev = ts
      }
      val g = got(u).sortBy(_.getAs[Long]("session_seq"))
      assert(g.length == sessions.length, s"user $u session count")
      g.zip(sessions).foreach { case (r, s) =>
        assert(r.getAs[Long]("n_turns") == s.length.toLong)
        assert(r.getAs[Long]("kept_turns") ==
          math.min(s.length, maxTurns).toLong)
        assert(r.getAs[Long]("truncated") ==
          (if (s.length > maxTurns) 1L else 0L))
        assert(r.getAs[Long]("duration_us") == s.last._3 - s.head._3)
        val want = s.take(maxTurns)
          .map(t => s"${t._2}@${(t._3 - s.head._3) / 1000000}")
          .mkString(" | ")
        assert(r.getAs[String]("transcript") == want, s"user $u")
      }
    }
    // the truncation arm fires somewhere at this SF
    assert(got.values.flatten.exists(_.getAs[Long]("truncated") == 1L))
  }

  test("B42: period deltas recount with floor semantics on negative changes") {
    import org.apache.spark.sql.functions._
    val rows = queries.Analytics.qPeriodOverPeriod(spark, dir).collect()
      .sortBy(_.getAs[Long]("month_idx"))
    assert(rows.length > 13, "need more than a year of months")
    def floorDiv(n: Long, d: Long): Long = Math.floorDiv(n, d)
    rows.zipWithIndex.foreach { case (r, i) =>
      val idx = r.getAs[Long]("month_idx")
      assert(r.getAs[Long]("year") == idx / 12)
      assert(r.getAs[Long]("month") == idx % 12 + 1)
      if (i == 0) {
        assert(r.getAs[Long]("has_mom") == 0L)
        assert(r.getAs[Long]("prev_cents") == -1L)
        assert(r.getAs[Long]("mom_delta_ppm") == 0L)
      } else if (rows(i - 1).getAs[Long]("month_idx") == idx - 1) {
        val prev = rows(i - 1).getAs[Long]("rev_cents")
        assert(r.getAs[Long]("has_mom") == 1L)
        assert(r.getAs[Long]("prev_cents") == prev)
        assert(r.getAs[Long]("mom_delta_ppm") ==
          floorDiv((r.getAs[Long]("rev_cents") - prev) * 1000000L, prev),
          s"month $idx")
      }
      val yoyBase = rows.find(_.getAs[Long]("month_idx") == idx - 12)
      (yoyBase, i >= 12) match {
        case (Some(b), _) =>
          assert(r.getAs[Long]("has_yoy") == 1L)
          assert(r.getAs[Long]("yoy_base_cents") == b.getAs[Long]("rev_cents"))
        case (None, false) => assert(r.getAs[Long]("has_yoy") == 0L)
        case _ =>
      }
    }
    // both delta signs occur (floor vs truncate would diverge on the
    // negative arm — it must be exercised)
    val moms = rows.filter(_.getAs[Long]("has_mom") == 1L)
      .map(_.getAs[Long]("mom_delta_ppm"))
    assert(moms.exists(_ < 0L) && moms.exists(_ > 0L),
      s"need both delta signs, got ${moms.toSeq}")
  }

  test("C76: covariance recounts from raw vectors and its diagonal IS C57's variance") {
    import org.apache.spark.sql.functions._
    val got = ops.Similarity.embeddingCovariance(spark, dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    val dim = 64
    assert(got.size == dim * (dim + 1) / 2, "upper triangle complete")
    val vecs = graft.util.Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray.map(x => math.round(x * 1000000d)))
    val n = vecs.length.toLong
    // exact integer recount for a deterministic sample of pairs
    for ((i, j) <- Seq((0L, 0L), (0L, 1L), (5L, 40L), (63L, 63L), (31L, 32L))) {
      val r = got((i, j))
      assert(r.getAs[Long]("n_vecs") == n)
      val sumQQ = vecs.map(v => v(i.toInt) * v(j.toInt)).sum
      val mi = Math.floorDiv(vecs.map(_(i.toInt)).sum, n)
      val mj = Math.floorDiv(vecs.map(_(j.toInt)).sum, n)
      assert(r.getAs[Long]("cov_e12") ==
        Math.floorDiv(sumQQ, n) - mi * mj, s"pair ($i, $j)")
      assert(r.getAs[Long]("diag") == (if (i == j) 1L else 0L))
    }
    // the diagonal equals C57's per-dimension variance — two
    // independently-built operators must agree exactly
    val vars = ops.Similarity.embeddingDimStats(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("var_e12")).toMap
    (0L until dim.toLong).foreach { d =>
      assert(got((d, d)).getAs[Long]("cov_e12") == vars(d), s"dim $d")
    }
    // off-diagonal structure exists (a fully-diagonal matrix would
    // make whitening pointless and the op vacuous here)
    assert(got.exists { case ((i, j), r) =>
      i != j && math.abs(r.getAs[Long]("cov_e12")) > 0L })
  }

  test("C80: power iteration finds the top eigenvector; projection is the exact quantized dot") {
    import org.apache.spark.sql.functions._
    // handcrafted 2x2 with known eigenstructure: [[5,2],[2,2]] (micro-
    // scaled) has top eigenvector ~ (0.894, 0.447) — ratio x0/x1 = 2
    val m = 1000000L
    val cov = Array(Array(5L * m, 2L * m), Array(2L * m, 2L * m))
    val x = ops.Similarity.powerIterate(2, cov, 12)
    assert(math.abs(x(0)) == m, "max-norm invariant: leading component = 1e6")
    // eigenvector of [[5,2],[2,2]]: (2, 1)/sqrt(5) -> x1/x0 = 0.5
    assert(math.abs(x(1).toDouble / x(0).toDouble - 0.5) < 1e-3, x.toSeq.toString)
    // degenerate all-zero covariance keeps the deterministic start
    val z = ops.Similarity.powerIterate(3, Array.fill(3, 3)(0L), 5)
    assert(z.toSeq == Seq(m, 0L, 0L))

    // production frame: variance along PC1 must beat the best single
    // axis (the start axis is the best axis, and power iteration only
    // improves the Rayleigh quotient from there)
    val proj = ops.Similarity.embeddingPcaProject(spark, dir).collect()
    assert(proj.length > 0)
    val ps = proj.map(_.getAs[Long]("proj_micro").toDouble)
    val n = ps.length.toDouble
    val mean = ps.sum / n
    val varPc1 = ps.map(p => (p - mean) * (p - mean)).sum / n
    val diagVars = ops.Similarity.embeddingDimStats(spark, dir).collect()
      .map(_.getAs[Long]("var_e12").toDouble)
    // proj is in micro units of the raw scale; var_e12 is micro^2
    assert(varPc1 >= diagVars.max * (1.0 - 1e-6),
      s"PC1 variance $varPc1 must dominate best axis ${diagVars.max}")
    // exact quantized-dot recount for a sample of vectors
    val cells = ops.Similarity.embeddingCovariance(spark, dir)
      .select(col("i"), col("j"), col("cov_e12")).collect()
    val dim = cells.iterator.map(_.getLong(1)).max.toInt + 1
    val cs = Array.ofDim[Long](dim, dim)
    cells.foreach { r =>
      val s = Math.floorDiv(r.getLong(2), 1000000L)
      cs(r.getLong(0).toInt)(r.getLong(1).toInt) = s
      cs(r.getLong(1).toInt)(r.getLong(0).toInt) = s
    }
    val xi = ops.Similarity.powerIterate(dim, cs, 12)
    val raw = graft.util.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val byId = proj.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Long]("proj_micro")).toMap
    for (id <- raw.keys.take(5)) {
      val v = raw(id)
      val p12 = v.indices.map { i =>
        val q = { val t = v(i) * 1000000d
          if (t < 0) -math.round(-t) else math.round(t) }
        q * xi(i)
      }.sum
      assert(byId(id) == Math.floorDiv(p12, 1000000L), s"vec $id")
    }
  }

  test("C80 sweep: quantized 12-step solve tracks the double-precision eigenvector on random PSD matrices") {
    // the A106/A109 randomized-sweep discipline applied to the solver:
    // seeded random PSD integer matrices (A^T A of random A). The
    // quantized 12-step iterate must reach ≥99.9% of the SAME-length
    // full-double iterate's Rayleigh quotient (micro-grid rounding
    // must not stall the walk — the property quantization could
    // break), and ≥90% of a 300-step converged reference (12 steps
    // genuinely dominate the spectrum; near-degenerate λ1≈λ2 draws
    // legitimately sit below 99% of converged at 12 steps)
    val rnd = new scala.util.Random(80)
    def rayleigh(c: Array[Array[Double]], x: Array[Double]): Double = {
      val d = c.length
      var num = 0.0; var den = 0.0
      for (i <- 0 until d) {
        den += x(i) * x(i)
        for (j <- 0 until d) num += x(i) * c(i)(j) * x(j)
      }
      if (den == 0) 0.0 else num / den
    }
    for (trial <- 1 to 20) {
      val d = 2 + rnd.nextInt(15)
      val a = Array.fill(d, d)(rnd.nextDouble() * 2 - 1)
      // PSD: C = A^T A, scaled to the integer micro grid
      val cM = Array.tabulate(d, d) { (i, j) =>
        var s = 0.0
        for (k <- 0 until d) s += a(k)(i) * a(k)(j)
        math.round(s * 1000000d)
      }
      val cD = cM.map(_.map(_.toDouble))
      val xq = ops.Similarity.powerIterate(d, cM, 12)
      // references from the same start: 12 and 300 full-double steps
      var d0 = 0
      for (i <- 1 until d) if (cM(i)(i) > cM(d0)(d0)) d0 = i
      def doubleIter(steps: Int): Array[Double] = {
        var xr = Array.tabulate(d)(i => if (i == d0) 1.0 else 0.0)
        for (_ <- 1 to steps) {
          val y = Array.tabulate(d) { i =>
            var s = 0.0; var j = 0
            while (j < d) { s += cD(i)(j) * xr(j); j += 1 }; s
          }
          val m = y.map(math.abs).max
          if (m != 0) xr = y.map(_ / m)
        }
        xr
      }
      val rq = rayleigh(cD, xq.map(_.toDouble))
      val r12 = rayleigh(cD, doubleIter(12))
      val r300 = rayleigh(cD, doubleIter(300))
      assert(rq >= r12 * 0.999,
        s"trial $trial dim $d: quantized $rq vs double-12 $r12")
      assert(rq >= r300 * 0.9,
        s"trial $trial dim $d: quantized $rq vs converged $r300")
    }
  }

  test("C75: segments tile each window gaplessly and re-derive C22's pack map") {
    import org.apache.spark.sql.functions._
    // ctx 256 at this SF so the straddling-doc split arm is exercised
    // (production ctx 2048 leaves sf0.001's shard streams one window)
    val ctx = 256L
    val segs = ops.Corpus.packAttentionSpans(spark, dir, ctx).collect()
    val packed = ops.Corpus.seqPack(spark, dir, ctx).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // token conservation: every doc's fragments sum to its token count
    val byDoc = segs.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == packed.keySet)
    byDoc.foreach { case (id, frags) =>
      val p = packed(id)
      assert(frags.map(_.getAs[Long]("seg_tokens")).sum ==
        p.getAs[Long]("n_tokens"), s"doc $id")
      // the head fragment sits exactly where C22 placed the doc
      val head = frags.filter(_.getAs[Long]("is_head") == 1L)
      assert(head.length == 1)
      assert(head.head.getAs[Long]("bin_id") == p.getAs[Long]("bin_id"))
      assert(head.head.getAs[Long]("seg_start") == p.getAs[Long]("bin_offset"))
      assert(frags.count(_.getAs[Long]("is_tail") == 1L) == 1)
      // fragments of one doc occupy consecutive windows, full interior
      val ord = frags.sortBy(_.getAs[Long]("bin_id"))
      ord.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("bin_id") == a.getAs[Long]("bin_id") + 1)
          assert(a.getAs[Long]("seg_end") == ctx)
          assert(b.getAs[Long]("seg_start") == 0L)
        case _ =>
      }
    }
    // windows tile gaplessly: segments abut and fill_ppm recounts;
    // every window except each stream's last is exactly full
    segs.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
      r.getAs[Long]("bin_id"))).foreach { case (win, rs) =>
      val ord = rs.sortBy(_.getAs[Long]("seg_seq"))
      assert(ord.map(_.getAs[Long]("seg_seq")).toSeq ==
        (1L to ord.length.toLong), s"window $win")
      assert(ord.head.getAs[Long]("seg_start") == 0L, s"window $win")
      ord.sliding(2).foreach {
        case Array(a, b) => assert(b.getAs[Long]("seg_start") ==
          a.getAs[Long]("seg_end"), s"window $win gap")
        case _ =>
      }
      val filled = ord.map(_.getAs[Long]("seg_tokens")).sum
      ord.foreach(r => assert(r.getAs[Long]("fill_ppm") ==
        filled * 1000000L / ctx))
    }
    val byStream = segs.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("shard")))
    byStream.foreach { case (st, rs) =>
      val lastBin = rs.map(_.getAs[Long]("bin_id")).max
      rs.filter(_.getAs[Long]("bin_id") < lastBin)
        .groupBy(_.getAs[Long]("bin_id")).foreach { case (b, ws) =>
          assert(ws.map(_.getAs[Long]("seg_tokens")).sum == ctx,
            s"stream $st interior window $b not full")
        }
    }
    // straddling docs exist at this SF (the split arm is real)
    assert(byDoc.values.exists(_.length > 1), "no straddling doc — vacuous")
  }

  test("C75 sweep: tiling invariants hold across context sizes") {
    import org.apache.spark.sql.functions._
    // odd, power-of-two, and tiny ctx values sweep the cut geometry
    for (ctx <- Seq(64L, 100L, 333L)) {
      val segs = ops.Corpus.packAttentionSpans(spark, dir, ctx).collect()
      val total = graft.util.Tables.documents(spark, dir)
        .select(sum(size(ops.Text.tokens(col("text")))).cast("long"))
        .head().getLong(0)
      // global token conservation at every ctx
      assert(segs.map(_.getAs[Long]("seg_tokens")).sum == total, s"ctx $ctx")
      segs.foreach { r =>
        assert(r.getAs[Long]("seg_start") >= 0L &&
          r.getAs[Long]("seg_end") <= ctx, s"ctx $ctx bounds")
        assert(r.getAs[Long]("seg_tokens") > 0L)
      }
      // per stream: windows are contiguous from 0
      segs.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
        .foreach { case (st, rs) =>
          val bins = rs.map(_.getAs[Long]("bin_id")).distinct.sorted
          assert(bins.toSeq == (0L to bins.max), s"ctx $ctx stream $st")
        }
    }
  }

  test("C78: chain audit flags transitive-only clusters and recounts real densities") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // synthetic chain A~B~C with no direct A~C, plus an exact 3-clique:
    // the chain reads density 2/3 and chained=1, the clique 1.0 and 0
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)).toDF("doc_id", "cluster_id")
    val pairs = Seq((2L, 1L), (3L, 2L),
      (11L, 10L), (12L, 10L), (12L, 11L)).toDF("u", "v")
    val syn = ops.Curation.chainAuditFromEdges(members, pairs).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val chain = syn(1L)
    assert(chain.getAs[Long]("n_possible_pairs") == 3L)
    assert(chain.getAs[Long]("n_direct_pairs") == 2L)
    assert(chain.getAs[Long]("direct_ppm") == 666666L)
    assert(chain.getAs[Long]("chained") == 1L)
    val clique = syn(10L)
    assert(clique.getAs[Long]("direct_ppm") == 1000000L)
    assert(clique.getAs[Long]("chained") == 0L)
    // real corpus: every multi-member cluster appears, density recounts
    val got = ops.Curation.clusterChainAudit(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val clusters = ops.Curation.dedupClusters(spark, dir).collect()
      .filter(_.getAs[Long]("cluster_size") > 1L)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    assert(got.keySet == clusters.map(_._2).toSet)
    clusters.groupBy(_._2).foreach { case (cid, ms) =>
      val r = got(cid)
      val k = ms.length.toLong
      assert(r.getAs[Long]("n_members") == k)
      assert(r.getAs[Long]("n_possible_pairs") == k * (k - 1) / 2)
      assert(r.getAs[Long]("n_direct_pairs") <= k * (k - 1) / 2)
      assert(r.getAs[Long]("n_direct_pairs") >= k - 1,
        s"cluster $cid: a component needs at least k-1 direct pairs")
      assert((r.getAs[Long]("chained") == 1L) ==
        (r.getAs[Long]("direct_ppm") < 1000000L))
    }
  }

  test("C74: batches cover every doc once, respect size, and waste recounts") {
    import org.apache.spark.sql.functions._
    val batchSize = 4
    val rows = ops.Corpus.lengthBatching(spark, dir).collect()
    val nDocs = graft.util.Tables.documents(spark, dir).count()
    // conservation: every document lands in exactly one batch
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= batchSize.toLong)
      assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"))
      // length band stays inside the bucket's 16-token window
      assert(r.getAs[Long]("max_len") - r.getAs[Long]("min_len") < 16L)
      val want = (r.getAs[Long]("max_len") * r.getAs[Long]("n_docs") -
        r.getAs[Long]("sum_len")) * 1000000L /
        (r.getAs[Long]("max_len") * r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("pad_waste_ppm") == want)
      // bucketing bounds the waste: a 16-wide band at min_len >= 10
      // can never waste more than 15/(min_len+15) of the batch
      assert(r.getAs[Long]("pad_waste_ppm") <= 600000L, r.toString)
    }
    // batch numbers are dense per (bucket, shard); only the LAST batch
    // of a group may be short
    rows.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard")))
      .foreach { case (g, rs) =>
        val ord = rs.sortBy(_.getAs[Long]("batch_no"))
        assert(ord.map(_.getAs[Long]("batch_no")).toSeq ==
          (0L until ord.length.toLong), s"group $g")
        ord.init.foreach(r =>
          assert(r.getAs[Long]("n_docs") == batchSize.toLong, s"group $g"))
      }
  }

  test("C70: fertility recounts from the segmentation and the source word tables") {
    import org.apache.spark.sql.functions._
    val got = ops.Corpus.tokenizerFertility(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.nonEmpty)
    val seg = ops.Corpus.bpeSegment(spark, dir).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("n_pieces"), r.getAs[Long]("n_chars"))).toMap
    val words = graft.util.Tables.documents(spark, dir)
      .select(col("source"), explode(ops.Text.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.length >= 2)
      .groupBy(_._1)
    assert(got.keySet == words.keySet)
    words.foreach { case (src, ws) =>
      val r = got(src)
      val n = ws.size.toLong
      val pieces = ws.map(w => seg(w._2)._1).sum
      val chars = ws.map(w => seg(w._2)._2).sum
      val single = ws.count(w => seg(w._2)._1 == 1L).toLong
      assert(r.getAs[Long]("n_words") == n, src)
      assert(r.getAs[Long]("fertility_e3") == pieces * 1000L / n, src)
      assert(r.getAs[Long]("chars_per_piece_e3") == chars * 1000L / pieces, src)
      assert(r.getAs[Long]("single_piece_ppm") == single * 1000000L / n, src)
      // fertility is at least one piece per word by construction
      assert(r.getAs[Long]("fertility_e3") >= 1000L)
    }
  }

  test("C71: leakage cells recount from the dedup edges and the split map") {
    import org.apache.spark.sql.functions._
    val got = ops.Curation.splitLeakage(spark, dir).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) -> r)
      .toMap
    assert(got.size == 6)
    val split = ops.Corpus.dataSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // independent pair recount: exact fp stars + verified jaccard pairs
    val fp = graft.util.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(ops.Text.norm(col("text")).cast("binary"))
        .as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    val exact = fp.values.filter(_.size > 1).flatMap { g =>
      val root = g.map(_._1).min
      g.map(_._1).filter(_ != root).map(d => (d, root))
    }
    val fuzzy = ops.Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_b"), r.getAs[Long]("doc_a")))
    val pairs = (exact ++ fuzzy).toSet
    assert(pairs.nonEmpty, "no dup pairs at this SF — the audit is vacuous")
    val cells = pairs.toSeq.map { case (u, v) =>
      val (a, b) = (split(u), split(v))
      (Seq(a, b).min, Seq(a, b).max)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (cell, r) =>
      assert(r.getAs[Long]("n_pairs") == cells.getOrElse(cell, 0L), cell)
      assert(r.getAs[Long]("leaky") == (if (cell._1 != cell._2) 1L else 0L))
      assert(r.getAs[Long]("share_ppm") ==
        cells.getOrElse(cell, 0L) * 1000000L / pairs.size)
    }
    // shares close to one million within per-cell truncation
    val shares = got.values.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares >= 1000000L - 6L)
  }

  test("C60: the two-phase cap equals the single-window rank and honors the cap") {
    import org.apache.spark.sql.functions._
    val cap = 10
    val got = ops.Curation.sourceCap(spark, dir, cap = cap).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // independent single-pass recount: plain per-source rank in Scala
    val base = graft.util.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.Portable.hash60(concat(lit("graft-cap-v1:"),
          col("doc_id").cast("string"))).as("prio"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("prio")))
    assert(got.keySet == base.map(_._1).toSet)
    base.groupBy(_._2).foreach { case (src, rows) =>
      val ranked = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      ranked.foreach { case ((id, _, _), i) =>
        val g = got(id)
        val wantRank = if (i < cap) i + 1L else -1L
        assert(g.getAs[Long]("cap_rank") == wantRank, s"doc $id in $src")
        assert(g.getAs[Long]("kept") == (if (i < cap) 1L else 0L))
        assert(g.getAs[Long]("n_source_docs") == rows.length.toLong)
      }
      assert(ranked.count(_._2 < cap) == math.min(cap, rows.length))
    }
  }

  test("C61: the growth curve's totals close and the curve is monotone") {
    import org.apache.spark.sql.functions._
    val rows = ops.Corpus.vocabGrowth(spark, dir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (0L to 9L))
    val toks = graft.util.Tables.documents(spark, dir)
      .select(explode(ops.Text.tokens(col("text"))).as("w"))
    assert(rows.last.getAs[Long]("cum_tokens") == toks.count())
    assert(rows.last.getAs[Long]("cum_types") ==
      toks.distinct().count())
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_tokens") > a.getAs[Long]("cum_tokens"))
        assert(b.getAs[Long]("cum_types") >= a.getAs[Long]("cum_types"))
      case _ =>
    }
    // per-bucket pieces re-sum to the cumulative
    var (ct, cy) = (0L, 0L)
    rows.foreach { r =>
      ct += r.getAs[Long]("n_tokens"); cy += r.getAs[Long]("n_new_types")
      assert(r.getAs[Long]("cum_tokens") == ct)
      assert(r.getAs[Long]("cum_types") == cy)
    }
  }

  test("C63: overlap matrix recounts from independent per-doc flags") {
    val got = ops.Curation.filterOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("f1"), r.getAs[String]("f2")) -> r).toMap
    assert(got.size == 6)
    val m = ops.Curation.qualityFilterBank(spark, dir).collect().map { r =>
      val nt = r.getAs[Long]("n_tokens")
      Map(
        "repetition" -> (r.getAs[Long]("dup_gram_ppm") > 20000L),
        "stopword" -> (r.getAs[Long]("stop_ppm") < 20000L),
        "top_gram" -> (r.getAs[Long]("top_gram_ppm") > 100000L),
        "word_count" -> (nt < 20L || nt > 100000L))
    }
    got.foreach { case ((f1, f2), r) =>
      val n1 = m.count(_(f1)); val n2 = m.count(_(f2))
      val nb = m.count(d => d(f1) && d(f2))
      assert(r.getAs[Long]("n_f1") == n1.toLong, s"$f1")
      assert(r.getAs[Long]("n_f2") == n2.toLong, s"$f2")
      assert(r.getAs[Long]("n_both") == nb.toLong, s"($f1,$f2)")
      val union = n1 + n2 - nb
      val wantJ = if (union > 0) nb.toLong * 1000000L / union else -1L
      assert(r.getAs[Long]("jaccard_ppm") == wantJ)
    }
  }

  test("B35: cube emits all four levels and margins reconcile") {
    val rows = queries.Analytics.qCube(spark, dir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val cellN = byGid(0L).map(_.getAs[Long]("n")).sum
    val grand = byGid(3L).head
    assert(grand.getAs[Long]("n") == cellN)
    // the status-only margin (gid=2, priority rolled up) is the level
    // rollup drops — its counts must re-sum the base cells per status
    val cellByStatus = byGid(0L)
      .groupBy(_.getAs[String]("o_orderstatus"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    byGid(2L).foreach { r =>
      assert(r.getAs[Long]("n") ==
        cellByStatus(r.getAs[String]("o_orderstatus")))
    }
  }

  test("B36: first/last/nth endpoints recount from collected history") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qFirstLast(spark, dir).collect()
      .map(r => r.getAs[Long]("custkey") -> r).toMap
    val hist = graft.util.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(got.keySet == hist.keySet)
    hist.take(50).foreach { case (ck, rows) =>
      val ord = rows.sortBy(r =>
        (r.getAs[Long]("date_us"), r.getAs[Long]("o_orderkey")))
      val g = got(ck)
      assert(g.getAs[Long]("n_orders") == ord.length.toLong)
      assert(g.getAs[Long]("first_cents") == ord.head.getAs[Long]("cents"))
      assert(g.getAs[Long]("last_cents") == ord.last.getAs[Long]("cents"))
      val second = if (ord.length >= 2) ord(1).getAs[Long]("o_orderkey") else -1L
      assert(g.getAs[Long]("second_orderkey") == second)
    }
  }

  test("B37: grid percentile equals the collected-sort interpolation") {
    import org.apache.spark.sql.functions._
    val got = queries.Analytics.qPercentileExact(spark, dir).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("p")) ->
        r.getAs[Long]("q_cents_x100")).toMap
    val vals = graft.util.Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().groupBy(_.getAs[String]("o_orderpriority"))
      .view.mapValues(_.map(_.getAs[Long]("cents")).sorted).toMap
    assert(got.keySet == (for (p <- vals.keySet; q <- Seq(25L, 50L, 75L))
      yield (p, q)))
    for ((prio, vs) <- vals; p <- Seq(25L, 50L, 75L)) {
      val n = vs.length.toLong
      val lo = ((n - 1) * p) / 100  // 0-based floor index
      val frac = ((n - 1) * p) % 100
      val want = vs(lo.toInt) * 100 +
        (if (frac > 0) (vs(lo.toInt + 1) - vs(lo.toInt)) * frac else 0L)
      assert(got((prio, p)) == want, s"($prio, p$p)")
    }
  }

  test("B38: string agg is the sorted comma-joined top-5 per nation") {
    val rows = queries.Analytics.qStringAgg(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getAs[String]("top5_names").split(",").toSeq
      assert(names.length <= 5)
      assert(names == names.sorted, "names not in ascending order")
      assert(r.getAs[Long]("n_customers") >= names.length.toLong)
    }
  }

  test("B39: decile grid covers 1..10 and rank ppm hits both ends") {
    val rows = queries.Analytics.qNtileCume(spark, dir).collect()
    val byPrio = rows.groupBy(_.getAs[String]("prio"))
    byPrio.foreach { case (prio, rs) =>
      val deciles = rs.map(_.getAs[Long]("decile")).toSet
      assert(deciles == (1L to 10L).toSet, s"$prio deciles $deciles")
      assert(rs.filter(_.getAs[Long]("decile") == 1L)
        .map(_.getAs[Long]("min_prank_ppm")).min == 0L)
      assert(rs.filter(_.getAs[Long]("decile") == 10L)
        .map(_.getAs[Long]("max_cume_ppm")).max == 1000000L)
      // bucket sizes differ by at most one (the NTILE contract)
      val sizes = rs.map(_.getAs[Long]("n_rows"))
      assert(sizes.max - sizes.min <= 1L, s"$prio sizes $sizes")
    }
  }
}
