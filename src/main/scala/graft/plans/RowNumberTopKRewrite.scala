package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the stock per-group top-k idiom
  *
  *   Project(cols without rn,
  *     Filter(rn <= k,
  *       Window(rn = row_number() over (partition by keys order by ord))))
  *
  * into the native bounded-heap operator ([[TopKPerKeyNode]]), removing
  * the per-partition SORT the window variant pays. This is the piece
  * that makes the native operator an ENGINE feature rather than an API:
  * users keep writing the idiomatic window formulation and the planner
  * swaps in the O(n log k) no-sort execution — the same transparency
  * contract as Spark's own InferWindowGroupLimit, taken the rest of the
  * way (group-limit still sorts and ranks the surviving rows; this
  * rewrite eliminates the window entirely).
  *
  * Guards (all must hold, otherwise the plan is left untouched):
  *  - the window function is exactly row_number() — rank/dense_rank keep
  *    MORE than k rows on ties, which a k-bounded heap cannot represent;
  *  - the filter condition is a sole `rn <= lit` / `rn < lit` / `rn = 1`
  *    comparison on the row_number output;
  *  - the projection above discards the rank column (the heap never
  *    materializes rank numbers);
  *  - the window has a non-empty ORDER BY (row_number over an unordered
  *    frame is nondeterministic anyway).
  *
  * Row-order caveat: the window formulation happens to emit rows sorted
  * within each partition; the heap emits them in eviction order. Neither
  * is a semantic guarantee without an explicit Sort above — same class
  * of reordering as exchange reuse or AQE replanning.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def limitFromCond(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rnId =>
      Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rnId =>
      Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rnId =>
      Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            part, order, child, _)))
        if order.nonEmpty &&
          limitFromCond(cond, alias.exprId).exists(_ >= 1) &&
          projectList.forall(!_.references.exists(_.exprId == alias.exprId)) =>
      val k = limitFromCond(cond, alias.exprId).get
      // Spark's InferWindowGroupLimit may already have inserted its
      // group-limit prefilter below the window; the native operator
      // subsumes it
      val inner = child match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      Project(projectList, TopKPerKeyNode(part, order, k, inner))
  }
}
