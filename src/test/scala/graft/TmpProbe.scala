package graft

import org.apache.spark.sql.functions._

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val MersenneP = 2147483647L
    def permA(p: Int): Long = ((2L * p + 1L) * 1000003L) % MersenneP
    def permB(p: Int): Long = (p.toLong * 7919L + 104729L) % MersenneP
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val docs = graft.util.Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        call_function("graft_word_ngrams", col("toks"), lit(3)).as("grams"))
      .filter(size(col("grams")) > 0)
      .localCheckpoint()
    time("grams") { docs.count() }
    val hashed = docs.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"),
        pmod(graft.functions.Portable.hash60(col("gram")), lit(MersenneP)).as("h"))
      .localCheckpoint()
    time("hashed") { hashed.count() }
    val mins = (0 until 128).map { p =>
      min(pmod(col("h") * lit(permA(p)) + lit(permB(p)), lit(MersenneP))).as(s"m$p")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("sig-1") { sig.count() }
    time("sig-2") { sig.count() }
    time("sig-3") { sig.count() }
    spark.stop()
  }
}
