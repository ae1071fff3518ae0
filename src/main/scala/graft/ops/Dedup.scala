package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: exact dedup is one hash aggregation (map-side
  * combine). The near-dup operators never form a cross product — LSH
  * banding bounds candidate generation to same-bucket pairs, and the
  * exact-Jaccard operator blocks by language. Signature computation is
  * pure higher-order array expressions (no UDFs, no shuffle until the
  * bucket join).
  */
object Dedup {

  /** C1 — exact dedup on normalized text: one row per distinct
    * fingerprint with the survivor (min doc_id) and multiplicity. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(md5(Text.norm(col("text")).cast("binary")).as("fingerprint"), col("doc_id"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    s"""SELECT md5(${Text.normSql("text")}) AS fingerprint,
       |  MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY 1""".stripMargin

  /** C4 — exact word-3-gram Jaccard near-dup pairs, blocked by
    * language (at 100 TB the block is what bounds the quadratic;
    * MinHash below replaces it when blocks are still too big). */
  def ngramJaccard(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), expr(Text.gramsExpr).as("grams"))
      .filter(size(col("grams")) > 0)
    val a = g.select(col("lang"), col("doc_id").as("doc_a"), col("grams").as("ga"))
    val b = g.select(col("lang"), col("doc_id").as("doc_b"), col("grams").as("gb"))
    a.join(b, Seq("lang")).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("ga")) + size(col("gb")) - col("inter")), 4))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def ngramJaccardSql(tau: Double = 0.5): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${Text.tokensSql("text")} AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, lang, ${Text.gramsSql} AS grams FROM t
       |), gg AS (SELECT * FROM g WHERE len(grams) > 0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE /
       |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
       |FROM gg a JOIN gg b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE /
       |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) >= $tau""".stripMargin

  /** C2 — MinHash + LSH near-dup pairs.
    *
    * shingle → 128 permutation minima (`xxhash64(shingle_hash, perm)`)
    * → 16 bands of 8 → band-bucket self-join → exact Jaccard verify on
    * the shingle-hash sets. Candidates are only same-bucket pairs, so
    * row amplification is ≤ bands×|docs| at explode and the verify join
    * touches no non-candidate pair. Rows-only oracle (not ANSI-SQL-
    * expressible). */
  def minhashLsh(spark: SparkSession, dir: String,
                 perms: Int = 128, bands: Int = 16, tau: Double = 0.5): DataFrame = {
    val rows = perms / bands
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr(Text.gramsExpr).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"),
        expr("transform(grams, g -> xxhash64(g))").as("sh"))
    val sigs = docs.select(col("doc_id"), col("sh"),
      expr(s"transform(sequence(0, ${perms - 1}), p -> array_min(transform(sh, h -> xxhash64(h, p))))")
        .as("sig"))
    val banded = sigs.select(col("doc_id"),
        expr(s"explode(transform(sequence(0, ${bands - 1}), b -> struct(b AS band_id, xxhash64(slice(sig, b * $rows + 1, $rows)) AS band_hash)))")
          .as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band_id", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(array_distinct(col("sa"))) + size(array_distinct(col("sb"))) - col("inter")), 4))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** C3 — SimHash near-dup candidates.
    *
    * 64-bit simhash over distinct word-3-gram hashes (shingles, not
    * unigrams: unigram sets are near-identical across docs sharing a
    * vocabulary, so they don't discriminate; per-bit majority vote,
    * computed with nested higher-order aggregates — bitwise OR
    * accumulation, safe under ANSI mode), LSH-banded into 4×16-bit
    * bands (a near-dup within Hamming 4 of 64 bits is guaranteed to
    * agree on ≥1 band); same-bucket pairs verify by Hamming distance.
    * Only verified pairs emit — candidate fan-out never leaves the
    * join. Rows-only oracle. */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr(Text.gramsExpr).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"),
        expr("transform(grams, g -> xxhash64(g))").as("th"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 63), 0L, (acc, i) ->
          |  acc | IF(aggregate(th, 0L, (a2, h) ->
          |           a2 + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L)) > 0L,
          |         shiftleft(1L, i), 0L))""".stripMargin).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
        expr("explode(transform(sequence(0, 3), b -> struct(b AS band_id, shiftright(simhash, b * 16) & 65535L AS band_val)))").as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_id"), col("band.band_val"))
    banded.as("x").join(banded.as("y"), Seq("band_id", "band_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
