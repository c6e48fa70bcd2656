package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[TopKPerGroup]] as a partial/final [[TopKPerGroupExec]]
  * pair; `EnsureRequirements` supplies the hash exchange between them
  * from the final node's `ClusteredDistribution`, exactly as it does
  * for partial/final aggregation.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      TopKPerGroupExec(groupExprs, order, k, partial = false,
        TopKPerGroupExec(groupExprs, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Rewrites the classic rank-limit idiom
  *
  * {{{
  *   Project [rank column dropped]
  *     Filter (row_number <= k)
  *       Window [row_number() OVER (PARTITION BY g ORDER BY o)]
  * }}}
  *
  * into [[TopKPerGroup]] whenever the rank column is used for nothing
  * but the limit predicate — the sort + window evaluation exist only
  * to be discarded, so the whole subtree collapses into the bounded
  * heap operator. The narrow trigger (single window expression, bare
  * rank predicate, rank attribute absent from the projection) keeps
  * the rule provably semantics-preserving; any other shape is left to
  * Spark's own planning. A `WindowGroupLimit` node that Spark's
  * `InferWindowGroupLimit` may already have inserted under the Window
  * is subsumed and stripped.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]) and
  * `spark.experimental.extraOptimizations`
  * ([[graft.GraftSession]]), so both the config-driven and the
  * embedded session paths get it.
  */
object RewriteRankLimit extends Rule[LogicalPlan] {

  /** `(rank-attr, predicate) → k`: the number of rows the predicate
    * keeps per group, if it is a pure rank limit.
    */
  private def limitOf(rankAttr: Attribute, cond: Expression): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v))
        if a.semanticEquals(rankAttr) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v))
        // v - 1 must not wrap: rn < Int.MinValue is an always-false
        // filter, and wrapping to Int.MaxValue would invert it
        if a.semanticEquals(rankAttr) && v > Int.MinValue => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rankAttr) => Some(1)
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute)
        if a.semanticEquals(rankAttr) => Some(v)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
            _)), _, _, wChild, _)))
        if order.nonEmpty &&
          !projectList.exists(_.references.contains(alias.toAttribute)) =>
      limitOf(alias.toAttribute, cond) match {
        case Some(k) if k >= 1 =>
          // If InferWindowGroupLimit already bounded this window, the
          // heap operator replaces that too.
          val base = wChild match {
            case WindowGroupLimit(_, _, _, _, inner) => inner
            case other => other
          }
          Project(projectList, TopKPerGroup(part, order, k, base))
        case _ => p
      }
  }
}
