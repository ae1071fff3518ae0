package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C81-C84 corpus-audit operators checked against independent
  * sequential implementations on synthetic fixtures plus structural
  * invariants on real data. */
class CorpusAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  // ---- C81 ----

  test("C81: concentration thresholds are exact on a hand-computable corpus") {
    // corpus: 'a'x10, 'b'x5, 'c'x3, 'd'x1, 'e'x1 -> N=20, vocab=5
    // 50% -> thresh 10 -> 'a' alone: 1 token
    // 90% -> thresh 18 -> a+b+c: 3 tokens
    // 99% -> thresh ceil(19.8)=20 -> all 5
    val text = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c")
      ++ Seq("d", "e")).mkString(" ")
    val docs = Seq((1L, text, "en", "src1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ops.Corpus.vocabConcentration(spark, dirFromView(docs))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(50L)._2 == 1L, s"50%: ${got(50L)}")
    assert(got(90L)._2 == 3L, s"90%: ${got(90L)}")
    assert(got(99L)._2 == 5L, s"99%: ${got(99L)}")
    assert(got(50L)._3 == 5L && got(50L)._4 == 20L)
  }

  /** The ops take a dir; write the fixture as a one-table dir. */
  private def dirFromView(docs: org.apache.spark.sql.DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("c81fix").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("C81: tokens_needed is monotone in mass and bounded by vocab on real data") {
    val rows = ops.Corpus.vocabConcentration(spark, dir)
      .orderBy("mass_pct").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "coverage counts must be monotone in the mass threshold")
    rows.foreach { r =>
      assert(r._2 >= 1L && r._2 <= r._3, s"needed within [1, vocab]: $r")
    }
    // brute-force cross-check: full vocabulary sort on the small tier
    val vocab = graft.util.Tables.documents(spark, dir)
      .select(explode(ops.Text.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect()
      .map(_._2).sortBy(-_)
    val n = vocab.sum
    def need(pct: Long): Long = {
      val thresh = (n * pct + 99) / 100
      var cum = 0L; var i = 0
      while (cum < thresh) { cum += vocab(i); i += 1 }
      i.toLong
    }
    rows.foreach { r =>
      assert(r._2 == need(r._1), s"brute-force disagrees at ${r._1}%: $r")
    }
  }

  // ---- C82 ----

  test("C82: shared prefixes and suffixes cluster, unique ones drop out") {
    val filler = (1 to 20).map(i => s"w$i").mkString(" ")
    val header = "one two three four five six seven eight"
    val footer = "p q r s t u v x"
    val docs = Seq(
      (1L, s"$header alpha $filler", "en", "s1", 0L),
      (2L, s"$header beta $filler gamma", "en", "s1", 0L),
      (3L, s"$filler delta $footer", "en", "s1", 0L),
      (4L, s"other start $filler epsilon $footer", "en", "s1", 0L),
      (5L, s"unique text entirely $filler on its own here", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ops.Dedup.prefixSuffixFrom(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    val byKind = got.groupBy(_._1)
    assert(byKind("prefix").length == 1 && byKind("suffix").length == 1,
      s"exactly one shared prefix and one shared suffix: ${got.toSeq}")
    val p = byKind("prefix").head
    assert(p._3 == 2L && p._4 == 1L && p._5 == 2L, s"prefix cluster: $p")
    val sfx = byKind("suffix").head
    assert(sfx._3 == 2L && sfx._4 == 3L && sfx._5 == 4L, s"suffix cluster: $sfx")
  }

  // ---- C83 ----

  test("C83: a verbatim copy has zero novelty, the first doc owns all its grams") {
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val b = (1 to 30).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, a, "en", "s1", 0L),
      (2L, a, "en", "s1", 0L), // verbatim copy of doc 1
      (3L, b, "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ops.Corpus.ngramNoveltyFrom(docs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 == got(1L)._2 && got(1L)._4 == 1000000L,
      s"first doc owns everything: ${got(1L)}")
    assert(got(2L)._3 == 0L && got(2L)._4 == 0L,
      s"verbatim copy is all old: ${got(2L)}")
    assert(got(3L)._4 == 1000000L, s"disjoint doc is all new: ${got(3L)}")
  }

  // ---- C84 ----

  test("C84: sources sharing a passage show symmetric shared-fp counts and sane ppms") {
    val got = ops.Retrieval.sourceDedupMatrix(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "the salted test corpus must share fps across sources")
    got.foreach { r =>
      assert(r._1 < r._2, s"pair ordering: $r")
      assert(r._3 <= r._4 && r._3 <= r._5,
        s"shared can't exceed either universe: $r")
      assert(r._6 == r._3 * 1000000L / r._4 && r._7 == r._3 * 1000000L / r._5,
        s"ppm arithmetic: $r")
    }
    // the matrix is over unordered pairs: no (b, a) duplicate of (a, b)
    val keys = got.map(r => (r._1, r._2)).toSet
    assert(got.length == keys.size)
    assert(!keys.exists { case (a, b) => keys.contains((b, a)) })
  }

  // ---- C85 ----

  test("C85: dsir bits are exact on a hand-computable two-source corpus") {
    // target src docs repeat 'x x x'; raw background repeats 'y y'.
    // Features of doc A (src0): unigrams x,x,x + bigrams 'x x','x x'
    // -> every feature is target-heavy, so dsir_bits must be > 0;
    // doc B (srcZ, all-y) must score < 0 (its features never occur in
    // the target) and both must match an independent sequential
    // recount of the bucket-grid arithmetic.
    val docs = Seq(
      (1L, "x x x", "en", "src0", 5L),
      (2L, "y y y y", "en", "srcZ", 7L),
      (3L, "x x y", "en", "srcZ", 5L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val d = dirFromView(docs)
    val B = 1024
    val got = ops.Curation.qualityDsir(spark, d, "src0", B)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // independent recount in plain Scala
    def feats(text: String): Seq[String] = {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val all = Seq("x x x" -> "src0", "y y y y" -> "srcZ", "x x y" -> "srcZ")
    val fr = all.flatMap { case (t, _) => feats(t) }
      .groupBy(g => graft.functions.Portable.hash60Long(g) % B)
      .view.mapValues(_.size.toLong).toMap
    val ft = all.filter(_._2 == "src0").flatMap { case (t, _) => feats(t) }
      .groupBy(g => graft.functions.Portable.hash60Long(g) % B)
      .view.mapValues(_.size.toLong).toMap
    val (rn, tn) = (fr.values.sum, ft.values.sum)
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    def bits(b: Long): Long =
      flog2((rn + B) / (fr.getOrElse(b, 0L) + 1)) -
        flog2((tn + B) / (ft.getOrElse(b, 0L) + 1))
    def docBits(t: String): Long =
      feats(t).map(g => bits(graft.functions.Portable.hash60Long(g) % B)).sum
    assert(got(1L)._3 == docBits("x x x"), s"target doc: ${got(1L)}")
    assert(got(2L)._3 == docBits("y y y y"), s"background doc: ${got(2L)}")
    assert(got(3L)._3 == docBits("x x y"), s"mixed doc: ${got(3L)}")
    assert(got(1L)._2 == 5L && got(2L)._2 == 7L, "n_feats = unigrams + bigrams")
    // absolute sign is washed out by add-one smoothing over 1024
    // buckets at a 17-feature fixture, but the ORDERING the sampler
    // consumes must hold: all-target > mixed > all-background
    assert(got(1L)._4 > got(3L)._4 && got(3L)._4 > got(2L)._4,
      s"mean_millibits must order target-likeness: ${got.values}")
  }

  // ---- C86 ----

  test("C86: phrase score is the exact word2vec ratio on a fixture") {
    // 'new york' appears 8x adjacently; 'new' 10x, 'york' 8x; filler
    // tokens push N up. score = (8-5)*N*1e6 // (10*8).
    val ny = Seq.fill(8)("new york").mkString(" ")
    val extraNew = Seq.fill(2)("new").mkString(" ")
    val filler = Seq.fill(24)("f").mkString(" ")
    val text = s"$ny $extraNew $filler"
    val docs = Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ops.Corpus.corpusPhrases(spark, dirFromView(docs))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val n = 8 * 2 + 2 + 24 // total tokens = 42
    assert(got.contains(("new", "york")), s"got keys: ${got.keys}")
    val r = got(("new", "york"))
    assert(r._3 == 8L && r._4 == 10L && r._5 == 8L)
    assert(r._6 == (8L - 5L) * n * 1000000L / (10L * 8L), s"score: $r")
    assert(r._7 == 1L, "well over the 1.5x-independence bar")
    // the filler run: 'f f' occurs 23x adjacently but 'f' itself is
    // 24/42 of the corpus, so the independence ratio stays under tau
    val f = got(("f", "f"))
    assert(f._3 == 23L && f._6 == (23L - 5L) * n * 1000000L / (24L * 24L))
    assert(f._7 == 0L, s"high-frequency filler is not a phrase: $f")
  }
}
