package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern.GENERATE

/** pg names a FROM-position set-returning function's single output column
  * after the TABLE alias: `FROM generate_series(1, 3) AS g` exposes column
  * `g`, not `generate_series` (pg SELECT docs, "If a function is used and
  * no column alias is given, the function name is used"; alias overrides).
  * Spark's `AS g` only aliases the relation. The engine's injected table
  * functions project their output under the pg default name
  * ([[graft.functions.SeriesFunctions]]) — when a SubqueryAlias wraps that
  * exact shape with a different name, rename the column to match. */
object SrfAliasRule extends Rule[LogicalPlan] {
  private val srfNames = Set("generate_series", "unnest")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithPruning(_.containsPattern(GENERATE)) {
    case sa @ SubqueryAlias(id, p @ Project(Seq(al @ Alias(c, n)), g: Generate))
        if srfNames.contains(n) && id.name != n =>
      sa.copy(child = Project(Seq(Alias(c, id.name)(exprId = al.exprId)), g))
  }
}
