package graft

import org.apache.spark.sql.functions._

/** Dev instrument (r16): attribute lsh_recall_audit's 32-core wall time
  * to its component actions — gram-cache build, sampling checkpoint,
  * banded checkpoint, truth BNLJ, candidate self-join, full query —
  * at the ambient SPARK_GRAFT_CPUS. Usage: LshProbe <sfDir> [reps] */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.util.GraftSession.local(cpus)
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lshprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val g = t("gramFrame.count")(ops.Dedup.gramFrame(spark, dir).count())
      val gf = ops.Dedup.gramFrame(spark, dir)
      val sampleMod = math.max(1L, (g + 1199L) / 1200L)
      val sampled = t("sampled.localCheckpoint") {
        gf.filter(pmod(graft.functions.Portable.hash60(concat(
          lit("graft-audit-v1:"), col("doc_id").cast("string"))),
          lit(sampleMod)) === 0L).localCheckpoint()
      }
      t("sampled.count")(sampled.count())
      val a = sampled.select(col("doc_id").as("doc_a"),
        sort_array(col("grams")).as("ga"), size(col("grams")).as("sa"))
      val b = sampled.select(col("doc_id").as("doc_b"),
        sort_array(col("grams")).as("gb"), size(col("grams")).as("sb"))
      val interC = graft.functions.VectorExprs
        .sortedIntersectSize(col("ga"), col("gb")).cast("double")
      val truth = a.join(b, col("doc_a") < col("doc_b") &&
          least(col("sa"), col("sb")).cast("double") >=
            lit(0.2 - 1e-4) * greatest(col("sa"), col("sb")) &&
          round(interC / (size(col("ga")) + size(col("gb")) - interC), 4)
            >= 0.2)
        .select(col("doc_a"), col("doc_b"))
      t("truth join (noop)")(truth.write.format("noop")
        .mode("overwrite").save())
      val banded = t("banded.localCheckpoint") {
        sampled.select(col("doc_id"),
          posexplode(graft.functions.VectorExprs.minhashBands(col("grams"),
            128, 16)).as(Seq("band_id", "band_key"))).localCheckpoint()
      }
      val cand = banded.as("x").join(banded.as("y"),
          Seq("band_id", "band_key"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      t("cand self-join (noop)")(cand.write.format("noop")
        .mode("overwrite").save())
      val full = SparkEntry.queries("lsh_recall_audit")(spark, dir)
      t("FULL lsh_recall_audit") {
        full.select(xxhash64(full.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      }
    }
    spark.stop()
  }
}
