package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Embedding similarity search: exact cosine pairs, brute-force ANN
  * top-k, and random-hyperplane LSH-bucketed ANN.
  *
  * Vectors are `array<float>` cast to double; dot products are
  * `zip_with` + `aggregate` higher-order expressions — row-local, no
  * UDFs. Scale design: the query set broadcasts (brute force is ONE
  * scan of the corpus); the LSH path prunes candidates by bucket
  * before scoring, trading recall for a corpus-fraction scan.
  */
object Similarity {

  private val toVec = col("embedding").cast("array<double>")

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  /** corpus with unit-norm metadata: (vec_id, label, v, nrm). */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), toVec.as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))

  /** C5 — near-duplicate cosine pairs within label blocks. */
  def cosinePairs(spark: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    val c = corpus(spark, dir)
    val a = c.select(col("label"), col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = c.select(col("label"), col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(dot("va", "vb") / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= tau)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cosine"))
  }

  private val cosSqlFrag =
    """list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
      |    (sqrt(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * a.v[i]))) *
      |     sqrt(list_sum(list_transform(range(1, len(b.v) + 1), i -> b.v[i] * b.v[i]))))""".stripMargin

  def cosinePairsSql(tau: Double = 0.4): String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND($cosSqlFrag, 4) AS cosine
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ROUND($cosSqlFrag, 4) >= $tau""".stripMargin

  /** C6 — brute-force exact ANN: top-k cosine neighbors for each query
    * vector (vec_id < nQueries). The query side is a broadcast; the
    * corpus is scanned once; ranking is per-query top-k on the rounded
    * score with vec_id tiebreak (deterministic). */
  def annTopK(spark: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(dot("qv", "v") / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
  }

  def annTopKSql(nQueries: Int = 8, k: Int = 5): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id,
       |    ROUND(${cosSqlFrag}, 4) AS cosine
       |  FROM e a JOIN e b ON a.vec_id < $nQueries AND b.vec_id <> a.vec_id
       |)
       |SELECT query_id, vec_id, cosine, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  /** C7 — LSH-bucketed ANN: random-hyperplane sign bits (hyperplane
    * components are deterministic ±1 from `xxhash64(plane, dim)`)
    * bucket the corpus; each query scores only its own bucket — the
    * scale path when the corpus no longer fits a full scan per query.
    * Rows-only oracle (approximate by construction). */
  def annLshBucketed(spark: SparkSession, dir: String,
                     planes: Int = 6, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val c = corpus(spark, dir)
    // bucket bit p = sign of <v, w_p>, w_p[i] = ±1 from xxhash64(p, i)
    val bucketed = c.withColumn("bucket", expr(
      s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) ->
         |  acc | IF(aggregate(zip_with(v, sequence(0, size(v) - 1),
         |             (x, i) -> x * IF((xxhash64(p, i) & 1L) = 1L, 1D, -1D)),
         |           0D, (s, t) -> s + t) >= 0D,
         |         shiftleft(1L, p), 0L))""".stripMargin))
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val scored = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(dot("qv", "v") / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("vec_id"), col("cosine"), col("rank"))
  }
}
