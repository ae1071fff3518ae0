package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, col, lit}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst vector expressions for the similarity operators.
  *
  * Why custom expressions (SURVEY §ops preference (b)): a 64-dim dot
  * product written as 64 unrolled `v[0]*w0 + …` terms codegens one
  * local per term — stack a few planes into one projection and the
  * generated class blows past Janino/JIT limits (observed: compile
  * failure → whole-stage interpreted fallback → 18× slowdown). These
  * expressions emit a constant-size LOOP instead: tiny generated code,
  * JIT-friendly, same left-to-right IEEE accumulation as the unrolled
  * form and as the DuckDB oracle rendering, at any dimension.
  *
  * Element nulls are not handled (inputs are dense numeric vectors);
  * a null array yields null via the null-safe wrappers.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are produced internally as array<double>; no public surface
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Dot product against a constant weight vector (e.g. an LSH
  * hyperplane). Weights ship as a referenced double[] — one object
  * reference in the generated class, not thousands of literals. */
case class DotLiteral(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  private lazy val w: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_literal"
  override def toString: String = s"dot_literal($child, dim=${weights.length})"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), w.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * w(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $wRef.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $wRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DotLiteral =
    copy(child = newChild)
}

/** Registration + Column-level entry points. The expressions register
  * through `SparkSessionExtensions.injectFunction` (the supported
  * public extension route — see GraftSession, which installs them on
  * every session this library builds). */
object VectorExprs {

  /** Install graft's native functions into a session builder's
    * extensions. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_literal"),
      new ExpressionInfo(classOf[DotLiteral].getName, "graft_dot_literal"),
      (children: Seq[Expression]) => {
        // second arg: a foldable array<double> of plane weights,
        // evaluated once at plan-build time
        val arr = children(1).eval(null).asInstanceOf[ArrayData]
        DotLiteral(children(0), arr.toDoubleArray.toSeq)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_ngrams"),
      (children: Seq[Expression]) => {
        val n = children(1).eval(null).asInstanceOf[Int]
        WordNGrams(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams_all"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_ngrams_all"),
      (children: Seq[Expression]) => {
        val n = children(1).eval(null).asInstanceOf[Int]
        WordNGrams(children(0), n, distinct = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountTokensIn].getName, "graft_count_in"),
      (children: Seq[Expression]) => {
        val arr = children(1).eval(null).asInstanceOf[ArrayData]
        val words = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
        CountTokensIn(children(0), words)
      }))
  }

  /** Column-level dot product of two array&lt;double&gt; columns. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot_product", a, b)

  /** Column-level dot product against constant weights. */
  def dotLit(v: Column, weights: Seq[Double]): Column =
    call_function("graft_dot_literal", v, array(weights.map(w => lit(w)): _*))

  def dot(a: String, b: String): Column = dot(col(a), col(b))
  def dotLit(v: String, weights: Seq[Double]): Column = dotLit(col(v), weights)
}
