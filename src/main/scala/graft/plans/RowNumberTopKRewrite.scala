package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4 ladder: `Rule[LogicalPlan]`): rewrites the
  * idiomatic top-k window —
  *
  * {{{ row_number() OVER (PARTITION BY g ORDER BY o) <= k }}}
  *
  * — into the [[GroupedTopK]] heap operator, so a user who writes the
  * standard Spark pattern gets the O(n log k) bounded-heap plan (no full
  * partition sort, no sort spill) without calling the operator API.
  * Fires only on the exact shape whose semantics the heap reproduces:
  * a single row_number window expression with the default running frame,
  * non-empty partition and order specs, filtered by `rn <= k` /
  * `rn < k+1` / `rn = 1`; other conjuncts are preserved as a residual
  * Filter above the operator. Spark's own InferWindowGroupLimit may
  * already have inserted a WindowGroupLimit below the Window — the heap
  * subsumes it, so it is stripped.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def rankBound(e: Expression, rnId: ExprId): Option[Int] = e match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rnId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference) if a.exprId == rnId => Some(k)
    case GreaterThan(Literal(k: Int, _), a: AttributeReference) if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, _)) if a.exprId == rnId => Some(1)
    case EqualTo(Literal(1, _), a: AttributeReference) if a.exprId == rnId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, wchild, _))
        if part.nonEmpty && order.nonEmpty =>
      val src = wchild match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(rankBound(_, rn.exprId))
      val rest = conjuncts.filter(rankBound(_, rn.exprId).isEmpty)
      if (bounds.size == 1 && bounds.size + rest.size == conjuncts.size
          && bounds.head > 0) {
        val topk = GroupedTopK(part, order, bounds.head, rn, src)
        if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
      } else f
  }
}

object GraftRules {
  /** Runtime registration on a live session (idempotent): heap strategy +
    * the window-rewrite rule (extraOptimizations run as the optimizer's
    * final user batch, after InferWindowGroupLimit — see rule doc). */
  def register(s: SparkSession): Unit = {
    GraftPlans.register(s)
    if (!s.experimental.extraOptimizations.contains(RowNumberTopKRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RowNumberTopKRewrite
  }
}
