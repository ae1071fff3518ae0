package graft

import org.apache.spark.sql.functions._

/** Scale-probe main for the IVF pruned list assignment (C13's
  * `pruneAssign` arm, Similarity.assignLists): times the EXACT n·k
  * assignment against the hyperplane-bucketed pruned one on the same
  * trained centroids, counts the candidate pairs each path scores, and
  * checks the measured work ratio against the expected
  * (assignPlanes+1)/2^assignPlanes. Also re-asserts totality (every
  * vector assigned exactly once) and reports the exact-vs-pruned
  * assignment agreement. Prints ONE JSON line; exits 1 if totality
  * breaks or the pruned path does MORE work than exact.
  *
  * Run against the 25× embeddings probe set for the scale signal:
  *   tools/scaleprobe.py emb /tmp/emb25x
  *   sbt "runMain graft.IvfAssignProbe /tmp/emb25x"
  */
object IvfAssignProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val assignPlanes =
      sys.env.getOrElse("SPARK_GRAFT_ASSIGN_PLANES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (c, cents, k) = ops.Similarity.ivfIndexInputs(spark, dir)
    val n = c.count()

    // wall time of each assignment, forced end-to-end (count over the
    // materialized lists; localCheckpoint in annIvf is not used here so
    // the timing covers the full candidate generation + top-1)
    def force(prune: Boolean): (Long, Double) =
      timed(ops.Similarity.assignLists(c, cents, prune, assignPlanes).count())
    val (exactRows, exactSec) = force(prune = false)
    val (prunedRows, prunedSec) = force(prune = true)

    // actual scored-pair work of each path
    val exactPairs = n * k
    val (candPairs, fallback) =
      ops.Similarity.assignWorkStats(c, cents, assignPlanes)
    val prunedPairs = candPairs + fallback * k
    val workRatio = prunedPairs.toDouble / exactPairs
    val expected = (assignPlanes + 1).toDouble / (1 << assignPlanes)

    // agreement: fraction of vectors both paths file under the same list
    // (ties and cell misses make this < 1 by design; the recall-floor
    // spec guards quality, this is just reported for the record)
    val ex = ops.Similarity.assignLists(c, cents, prune = false)
      .select(col("vec_id"), col("cent_id").as("ce"))
    val pr = ops.Similarity.assignLists(c, cents, prune = true, assignPlanes)
      .select(col("vec_id"), col("cent_id").as("cp"))
    val agree = ex.join(pr, Seq("vec_id"))
      .agg(avg(when(col("ce") === col("cp"), 1.0).otherwise(0.0)))
      .head.getDouble(0)

    val total = prunedRows == n && exactRows == n
    val ok = total && prunedPairs < exactPairs
    val json =
      s"""{"probe":"ivf_assign_prune","sf":"$dir","n":$n,"k":$k,""" +
        s""""assign_planes":$assignPlanes,"exact_sec":${f3(exactSec)},""" +
        s""""pruned_sec":${f3(prunedSec)},"exact_pairs":$exactPairs,""" +
        s""""pruned_pairs":$prunedPairs,"fallback_rows":$fallback,""" +
        s""""work_ratio":${f3(workRatio)},"expected_ratio":${f3(expected)},""" +
        s""""agreement":${f3(agree)},"total":$total,"ok":$ok}"""
    spark.stop()
    println(json)
    if (!ok) System.exit(1)
  }

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
