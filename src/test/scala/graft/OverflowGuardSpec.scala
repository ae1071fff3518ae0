package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, Literal, Multiply, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window => WindowNode}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The overflow lint (round-10 mandate #2): q_share_of_total's
  * ARITHMETIC_OVERFLOW existed only at sf10 — the sf<=0.1 DuckDB oracle
  * can never catch the ppm/micro wrap class, because Long only wraps
  * once an aggregate crosses ~9.2e18/scale. The guard is static: no
  * registered query may multiply an AGGREGATE-DERIVED Long (anything
  * whose lineage passes through a Sum or Count, in an Aggregate or a
  * Window — the values that grow with the corpus) by a fixed-point
  * scaling literal >= 10^4 in Long arithmetic. Those numerators run in
  * decimal(38); IntegralDivide returns LongType for decimal inputs
  * too, so the bounded BIGINT ratio and the oracle hash are unchanged
  * — the same promotion DuckDB gets from HUGEINT.
  *
  * Deliberately conservative: per-document aggregates (gram
  * intersections, token counts) are value-bounded but still flagged —
  * a bound argued only in a comment is exactly what rotted in
  * q_share_of_total, and the decimal multiply sits on post-shuffle
  * frames where its cost is noise.
  *
  * Allowed class (id-packing, not ratios): Multiply by 2^k composing a
  * fixed-width KEY layout from dimension ranks (base * 1048576 in the
  * schema-store physical ids, the reference's own id-packing shape) —
  * widening those to decimal would change key semantics, and their
  * factors are dimension cardinalities, not corpus volume.
  */
class OverflowGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  private val Threshold = 10000L
  /** 2^20 id-packing factor: key layout arithmetic, not fixed-point */
  private val PackingFactors = Set(1048576L)

  private def litVal(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  private def hasSumCount(e: Expression): Boolean = e.exists {
    case ae: AggregateExpression => ae.aggregateFunction match {
      case _: Sum | _: Count => true
      case _ => false
    }
    case _ => false
  }

  /** attrs whose lineage passes through a Sum/Count (agg or window),
    * propagated through Project arithmetic */
  private def growthAttrs(plan: LogicalPlan): Set[ExprId] = {
    val grown = scala.collection.mutable.Set.empty[ExprId]
    def mark(ne: NamedExpression): Unit = {
      val derived = hasSumCount(ne) ||
        ne.references.exists(r => grown(r.exprId))
      if (derived) grown += ne.toAttribute.exprId
    }
    plan.foreachUp {
      case a: Aggregate => a.aggregateExpressions.foreach(mark)
      case w: WindowNode => w.windowExpressions.foreach(mark)
      case p: Project => p.projectList.foreach(mark)
      case _ => ()
    }
    grown.toSet
  }

  test("no aggregate-derived Long multiplies by a scaling literal >= 1e4") {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, dir).queryExecution.analyzed
      val grown = growthAttrs(plan)
      plan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case m @ Multiply(a, b, _) if m.dataType == LongType =>
            litVal(a).orElse(litVal(b))
              .filter(v => math.abs(v) >= Threshold)
              .filterNot(PackingFactors)
              .foreach { _ =>
                val other = if (litVal(a).isDefined) b else a
                val aggDerived = hasSumCount(other) ||
                  other.references.exists(r => grown(r.exprId))
                if (aggDerived) violations += s"$name: $m"
              }
          case _ =>
        })
      }
    }
    assert(violations.isEmpty,
      "\nLong multiply of an aggregate-derived value by a >=1e4 literal " +
        "(overflow class — run the numerator in decimal(38)):\n" +
        violations.distinct.mkString("\n"))
  }
}
