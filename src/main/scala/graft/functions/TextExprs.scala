package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams over a token array — the shingling front end
  * of every near-dup operator.
  *
  * The declarative form (`transform(sequence(...), i -> concat(...))`
  * + `array_distinct`) runs as interpreted higher-order lambdas at
  * ~ms per document; this expression is one compiled JVM loop with a
  * linked hash set (first-occurrence order, exactly `array_distinct`
  * semantics, and set-identical to the DuckDB oracle's
  * `list_distinct(list_transform(...))`). CodegenFallback is fine
  * here: the single virtual call per row is noise next to the O(tokens)
  * gram construction the loop performs. Fewer than `n` tokens yields
  * an empty array, matching the declarative CASE guard. */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    def gram(i: Int): UTF8String = {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      UTF8String.concatWs(sep, parts: _*)
    }
    if (!distinct) {
      // the full occurrence multiset — repetition profiling needs the
      // duplicates the set form drops (list_transform semantics)
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) { out(i) = gram(i); i += 1 }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) { seen.add(gram(i)); i += 1 }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** Count of token-array elements contained in a constant word set —
  * the stopword/marker-profile primitive of language ID and quality
  * scoring. One compiled loop + hash-set probe per token, replacing
  * the interpreted `size(filter(toks, t -> t IN (...)))` lambda. */
case class CountTokensIn(child: Expression, words: Seq[String])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "count_tokens_in"

  private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var count = 0L
    var i = 0
    while (i < m) { if (set.contains(arr.getUTF8String(i))) count += 1; i += 1 }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): CountTokensIn =
    copy(child = newChild)
}

/** All MinHash-LSH band keys of a gram array in ONE pass — the
  * banding front end of C2/C79 computed row-locally: per gram one
  * portable md5 hash60 mod P (P = 2^31−1), per permutation p the
  * universal hash `(h·a_p + b_p) mod P` with `a_p = ((2p+1)·1000003)
  * mod P`, `b_p = (p·7919 + 104729) mod P` (the
  * [[graft.ops.Dedup]] constants), min across grams, and band b's key
  * = mins[b·rows … b·rows+rows) joined with ','. Replaces the
  * explode → 128-min groupBy shape: the gram array is already
  * per-document, so the signature needs NO shuffle at all — banding
  * becomes a row-local projection, which is also what lets the
  * incremental-dedup stream twin probe a static index without
  * stateful aggregation. All arithmetic stays below 2^62 (h, a_p
  * < 2^31), so the identical signature is computable in any engine.
  * CodegenFallback: the per-gram md5 dominates; one virtual call per
  * row is noise. */
/** The shared md5-prefix hash of [[graft.functions.Portable.hash60]],
  * computed straight off the digest bytes (first 15 hex chars = bytes
  * 0..6 + the high nibble of byte 7). */
private[functions] object Hash60 {
  def of(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val digest = md.digest(s.getBytes)
    var h60 = 0L
    var j = 0
    while (j < 7) { h60 = (h60 << 8) | (digest(j) & 0xffL); j += 1 }
    (h60 << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}

case class MinhashBandKeys(child: Expression, perms: Int, bands: Int)
  extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L
  private val rows = perms / bands
  private lazy val pa: Array[Long] =
    Array.tabulate(perms)(p => ((2L * p + 1L) * 1000003L) % P)
  private lazy val pb: Array[Long] =
    Array.tabulate(perms)(p => (p.toLong * 7919L + 104729L) % P)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"
  override def toString: String =
    s"minhash_band_keys($child, perms=$perms, bands=$bands)"

  override def nullSafeEval(grams: Any): Any = {
    val arr = grams.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      val h = Hash60.of(md, arr.getUTF8String(i)) % P
      var p = 0
      while (p < perms) {
        val v = (h * pa(p) + pb(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rows * 11)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rows + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

/** The 60-bit SimHash of a gram array in ONE row-local pass — C3's
  * signature computed where the data already is: per gram one
  * portable hash60, per bit a +1/−1 majority vote, bit set when the
  * vote is positive. Replaces the explode → 60-vote groupBy (a
  * corpus-scale shuffle for a row-local value — the MinhashBandKeys
  * argument, applied to the simhash front end). */
case class SimhashValue(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_value"

  override def nullSafeEval(grams: Any): Any = {
    val arr = grams.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      val h = Hash60.of(md, arr.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashValue =
    copy(child = newChild)
}
