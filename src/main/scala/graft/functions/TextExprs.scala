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
