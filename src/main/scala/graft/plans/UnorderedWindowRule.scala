package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** pg permits ranking/offset window functions over an UNORDERED window
  * (`row_number() OVER ()`); the row order is engine-defined. Spark
  * rejects the empty order at analysis. Inject a constant sort key —
  * which is precisely pg's semantics: with no ORDER BY every partition
  * row is a PEER, so `rank()`/`dense_rank()` yield 1 for all rows,
  * `cume_dist()` 1.0, `percent_rank()` 0, and `row_number()` numbers
  * rows in an engine-defined order (Spark: partition encounter order,
  * matching the reference's input order on ordered inputs).
  * Reference `src/sql/src/plan/query.rs` window planning (no
  * order-required check); pg window function docs. */
object UnorderedWindowRule extends Rule[LogicalPlan] {
  private def needsOrder(fn: Expression): Boolean = fn match {
    case _: RowNumber | _: Rank | _: DenseRank | _: PercentRank |
        _: CumeDist | _: NTile | _: Lead | _: Lag => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.WINDOW_EXPRESSION))
      return plan
    plan.resolveExpressions {
      case we @ WindowExpression(fn,
          spec @ WindowSpecDefinition(_, Seq(), _)) if needsOrder(fn) =>
        we.copy(windowSpec = spec.copy(orderSpec =
          Seq(SortOrder(Literal(0), Ascending))))
    }
  }
}
