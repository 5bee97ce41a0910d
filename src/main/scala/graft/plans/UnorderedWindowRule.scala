package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Parse-time window normalization + frame validation.
  *
  * pg permits ranking/offset window functions over an UNORDERED window
  * (`row_number() OVER ()`); the row order is engine-defined. Spark
  * rejects the empty order at analysis. Inject a constant sort key —
  * which is precisely pg's semantics: with no ORDER BY every partition
  * row is a PEER, so `rank()`/`dense_rank()` yield 1 for all rows and
  * `row_number()` numbers rows in an engine-defined order. pg likewise
  * ignores any (VALID) frame clause on ranking/offset functions, while
  * Spark rejects explicit frames for them — so the frame is normalized
  * away AFTER validation.
  *
  * Frame VALIDATION (the reference statically rejects impossible ROWS
  * frames and every non-default RANGE frame) happens in the SLT shim's
  * text layer: bound TYPES are syntactic — `-1 FOLLOWING` and
  * `1 PRECEDING` parse to the same Catalyst tree — so the plan cannot
  * distinguish what the reference rejects from what it runs as an empty
  * frame.
  *
  * Applied at PARSE time (from [[graft.sql.GraftSqlParser]]): Spark's
  * analyzer throws from `ResolveWindowOrder` in the same fixpoint
  * iteration that resolves the function name, BEFORE injected resolution
  * rules run, so this cannot live in the resolution batch. */
object UnorderedWindowNormalize {
  private val rankingOrOffset = Set("row_number", "rank", "dense_rank",
    "percent_rank", "cume_dist", "ntile", "lead", "lag")

  private def needsNormalize(fn: Expression): Boolean = fn match {
    case u: UnresolvedFunction =>
      rankingOrOffset.contains(u.nameParts.last.toLowerCase)
    case _ => false
  }

  /** Cheap text gate so non-windowed SQL never pays the plan traversal.
    * Word-bounded: `recover`/`coverage`/`turnover` must not pay the
    * whole-plan `transformUpWithSubqueries` walk at parse time. */
  private val overKeyword = java.util.regex.Pattern.compile(
    "\\bover\\b", java.util.regex.Pattern.CASE_INSENSITIVE)

  def mayApply(sqlText: String): Boolean =
    overKeyword.matcher(sqlText).find()

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case p =>
      p.transformExpressionsUp {
        case we @ WindowExpression(fn, spec: WindowSpecDefinition)
            if needsNormalize(fn) &&
              (spec.orderSpec.isEmpty ||
                spec.frameSpecification != UnspecifiedFrame) =>
          we.copy(windowSpec = spec.copy(
            orderSpec =
              if (spec.orderSpec.isEmpty)
                Seq(SortOrder(Literal(0), Ascending))
              else spec.orderSpec,
            frameSpecification = UnspecifiedFrame))
      }
  }
}
