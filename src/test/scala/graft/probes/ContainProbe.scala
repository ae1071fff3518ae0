package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: plan-shape A/B for C42 dedup_containment's exact verify
  * (the r10 docs10 regression). Variants:
  *   v1      pair->grams fan-out, SMJ (the mandated shape, as shipped)
  *   v1shj   same with shuffle_hash hints (no 174M-row sorts)
  *   v2      inverted-index pair counts + candidate semi-join
  * Usage: ContainProbe <sfDir>. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.GraftSession.local(32)
    import ops.{Dedup, Retrieval}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("gram cache build")(Dedup.gramFrame(spark, dir).count())
    val fps = Retrieval.winnowHashesCached(spark, dir, 4)
    time("winnow fps build")(fps.count())

    val fpsS = fps.select(col("doc_id"), col("fp_hash"))
    val cand = fpsS.as("a").join(fpsS.as("b"), Seq("fp_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint()
    println(s"[probe] n_cand = ${cand.count()}")
    val g = Dedup.gramFrame(spark, dir)
    val ex = g.select(col("doc_id"), explode(col("grams")).as("gram"))

    def v1(hint: Boolean): DataFrame = {
      val exB = ex.select(col("doc_id").as("doc_b"), col("gram"))
      cand
        .join(if (hint) ex.select(col("doc_id").as("doc_a"), col("gram"))
                .hint("shuffle_hash")
              else ex.select(col("doc_id").as("doc_a"), col("gram")),
          Seq("doc_a"))
        .join(if (hint) exB.hint("shuffle_hash") else exB, Seq("doc_b", "gram"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
    }
    def v2: DataFrame = ex.as("x")
      .join(ex.as("y"), Seq("gram"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")

    val n1 = time("v1 smj (shipped)")(v1(hint = false).count())
    val n1b = time("v1 shj hints")(v1(hint = true).count())
    val n2 = time("v2 inverted+semi")(v2.count())
    println(s"[probe] counts v1=$n1 v1shj=$n1b v2=$n2")
    // second pass, caches warm
    time("v1 smj (2nd)")(v1(hint = false).count())
    time("v1 shj (2nd)")(v1(hint = true).count())
    time("v2 inverted (2nd)")(v2.count())
    spark.stop()
  }
}
