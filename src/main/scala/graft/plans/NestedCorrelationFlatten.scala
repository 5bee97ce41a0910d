package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}

/** Decorrelation of MULTI-LEVEL correlated subqueries, which Spark's
  * analyzer rejects: an outer reference resolves exactly ONE level up, so
  *
  *   SELECT .. FROM t1 WHERE EXISTS (
  *     SELECT .. FROM t2 WHERE EXISTS (
  *       SELECT .. FROM t3 WHERE t1.a = t3.a AND t2.b = t3.b))
  *
  * fails with UNRESOLVED_COLUMN on `t1.a`. The reference engine plans
  * these by decorrelating every subquery against the full stack of outer
  * scopes during HIR lowering (materialize `src/sql/src/plan/lowering.rs:
  * 964-996`). Here the same queries run after a pre-analysis plan rewrite
  * that ELIMINATES the inner nesting levels instead:
  *
  *   EXISTS (SELECT .. FROM t2 WHERE EXISTS (SELECT .. FROM t3 WHERE p))
  *     ==>  EXISTS (SELECT .. FROM t2 LEFT SEMI JOIN t3 ON p)
  *
  * Two layers with different multiplicity contracts:
  *  - at the BOUNDARY (a Filter directly inside a subquery plan), EXISTS /
  *    NOT EXISTS / IN conjuncts become LEFT SEMI / LEFT ANTI joins, which
  *    preserve left-side multiplicity exactly — sound in ANY enclosing
  *    context (EXISTS, IN, scalar aggregate);
  *  - INSIDE an EXISTS being decomposed, nested positive EXISTS / IN
  *    conjuncts merge as plain Inner joins with their predicates hoisted
  *    into the returned condition (EXISTS only observes nonemptiness, so
  *    row multiplication is free) — this is what lets 3+-level chains
  *    flatten completely, every correlation ending up in the outermost
  *    join's ON clause where one-level outer references are legal.
  *
  * Soundness stance: every rewrite step here is an equivalence; anything
  * not recognized is passed through as `(plan, no condition)` — i.e.
  * `EXISTS(q) == child LEFT SEMI JOIN q ON true` — whose internal
  * correlation then simply fails analysis and the caller reports the
  * original error. The ONLY semantic judgment made on unresolved trees is
  * aggregate detection (the parser emits plain Project for `SELECT max(x)`;
  * an ungrouped aggregate subquery always yields one row, so pulling its
  * filter out would be wrong) — guarded by an over-inclusive aggregate
  * function-name list: over-listing merely declines a flatten.
  */
object NestedCorrelationFlatten extends PredicateHelper {

  /** Parse `sql`, flatten nested correlation inside every subquery
    * expression, and return the running DataFrame — None when the rewrite
    * changes nothing or the rewritten plan still fails analysis. Intended
    * as a RESCUE path after `spark.sql` failed with UNRESOLVED_COLUMN: it
    * can only widen the set of accepted queries, never change an answer
    * Spark already gives. */
  def rescue(spark: SparkSession, sql: String): Option[DataFrame] = {
    try {
      val parsed = spark.sessionState.sqlParser.parsePlan(sql)
      val rewritten = rewriteSubqueries(parsed)
      if (rewritten.fastEquals(parsed)) None
      else {
        val df = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, rewritten)
        df.queryExecution.assertAnalyzed()
        Some(df)
      }
    } catch { case _: Throwable => None }
  }

  /** The outermost query level is untouched (Spark resolves one level of
    * correlation natively); each subquery expression's plan goes through
    * the multiplicity-preserving boundary pass. */
  def rewriteSubqueries(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e: Exists => e.copy(plan = boundary(e.plan))
      case l: ListQuery => l.copy(plan = boundary(l.plan))
      case s: ScalarSubquery => s.copy(plan = boundary(s.plan))
    }

  /** Multiplicity-preserving pass over a subquery plan: EXISTS / NOT
    * EXISTS / IN conjuncts of its Filters become semi/anti joins
    * (decomposed from their RAW plans, so nested conditions surface into
    * the boundary join's ON rather than getting buried one level down);
    * subquery expressions in every OTHER position recurse through
    * boundary individually. */
  private def boundary(p: LogicalPlan): LogicalPlan =
    p.transformUp {
      case Filter(cond, child0) =>
        var child = child0
        val kept = splitConjunctivePredicates(cond).map {
          case c @ Exists(q, _, _, _, _) =>
            decomposeExists(q) match {
              case (b, on) if !(b eq q) || on.isEmpty =>
                child = Join(child, b, LeftSemi, on, JoinHint.NONE)
                Literal.TrueLiteral
              case _ => c
            }
          case c @ Not(Exists(q, _, _, _, _)) =>
            decomposeExists(q) match {
              case (b, on) if !(b eq q) || on.isEmpty =>
                child = Join(child, b, LeftAnti, on, JoinHint.NONE)
                Literal.TrueLiteral
              case _ => c
            }
          case c @ InSubquery(values, l: ListQuery) =>
            decomposeIn(l.plan, values) match {
              case Some((b, on)) =>
                child = Join(child, b, LeftSemi, Some(on), JoinHint.NONE)
                Literal.TrueLiteral
              case None => c
            }
          case other => rewriteExprSubqueries(other)
        }.filterNot(_ == Literal.TrueLiteral)
        if (child eq child0) Filter(cond, child0)
        else if (kept.isEmpty) child
        else Filter(kept.reduce(And), child)
      case other => other.transformExpressions {
        case e: Exists => e.copy(plan = boundary(e.plan))
        case l: ListQuery => l.copy(plan = boundary(l.plan))
        case s: ScalarSubquery => s.copy(plan = boundary(s.plan))
      }
    }

  /** Recurse boundary into subqueries sitting in NON-conjunct expression
    * positions (under OR, scalar comparisons, CASE arms...). */
  private def rewriteExprSubqueries(e: Expression): Expression = e.transform {
    case ex: Exists => ex.copy(plan = boundary(ex.plan))
    case l: ListQuery => l.copy(plan = boundary(l.plan))
    case s: ScalarSubquery => s.copy(plan = boundary(s.plan))
  }

  /** `EXISTS (q)` as a (joinable-plan, ON-condition) pair such that
    * `child LEFT SEMI JOIN plan ON cond` == `child WHERE EXISTS(q)`.
    * Nested positive EXISTS / IN conjuncts inside q merge as Inner joins
    * (multiplicity is unobservable under EXISTS); NOT EXISTS conjuncts
    * become LEFT ANTI joins whose condition must stay at the join (anti
    * semantics), which limits them to one level of outer reference —
    * deeper ones simply fail analysis later. Unrecognized shapes return
    * `(q, None)`, the always-sound identity form. */
  private def decomposeExists(q: LogicalPlan): (LogicalPlan, Option[Expression]) =
    q match {
      case Project(projList, inner)
          if !projList.exists(containsAggFn) && !projList.exists(hasWindow) =>
        decomposeExists(inner)
      case Distinct(inner) => decomposeExists(inner)
      case s: Sort => decomposeExists(s.child)
      case a: Aggregate if a.groupingExpressions.nonEmpty =>
        // a GROUPED aggregate is nonempty iff its input is nonempty
        decomposeExists(a.child)
      case Filter(w, base0) if !hasWindow(w) =>
        var base = boundary(base0) // derived tables inside the FROM
        val conds = scala.collection.mutable.ListBuffer.empty[Expression]
        splitConjunctivePredicates(w).foreach {
          case Exists(q2, _, _, _, _) =>
            val (b2, c2) = decomposeExists(q2)
            base = Join(base, b2, Inner, None, JoinHint.NONE)
            conds ++= c2
          case Not(Exists(q2, _, _, _, _)) =>
            val (b2, c2) = decomposeExists(q2)
            base = Join(base, b2, LeftAnti, c2, JoinHint.NONE)
          case InSubquery(values, l: ListQuery) =>
            decomposeIn(l.plan, values) match {
              case Some((b2, c2)) =>
                base = Join(base, b2, Inner, None, JoinHint.NONE)
                conds += c2
              case None =>
                conds += InSubquery(values, l.copy(plan = boundary(l.plan)))
            }
          case other => conds += rewriteExprSubqueries(other)
        }
        (base, conds.reduceOption(And))
      case other => (other, None)
    }

  /** `values IN (SELECT e.. FROM base WHERE w)` as (base, w AND v=e..) —
    * sound in positive conjunct position, where NULL and FALSE both
    * reject the row. */
  private def decomposeIn(q: LogicalPlan, values: Seq[Expression])
      : Option[(LogicalPlan, Expression)] = q match {
    case Distinct(inner) => decomposeIn(inner, values)
    case s: Sort => decomposeIn(s.child, values)
    case Project(projList, inner) if projList.length == values.length &&
        !projList.exists(e => containsAggFn(e) || hasWindow(e) ||
          e.exists(_.isInstanceOf[UnresolvedStar])) =>
      val (base, w) = decomposeExists(inner)
      val eqs: Seq[Expression] =
        values.zip(projList).map { case (v, pe) => EqualTo(v, stripAlias(pe)) }
      Some((base, (w.toSeq ++ eqs).reduce(And)))
    case _ => None
  }

  private def stripAlias(e: Expression): Expression = e match {
    case org.apache.spark.sql.catalyst.analysis.UnresolvedAlias(c, _) => c
    case Alias(c, _) => c
    case x => x
  }

  /** Aggregate detection on UNRESOLVED trees (the parser emits Project for
    * `SELECT max(x) ..`; Aggregate nodes only appear for GROUP BY).
    * Over-inclusive on purpose: a false positive declines a flatten (the
    * identity form still applies); a false negative would flatten an
    * always-one-row subquery wrongly. Covers pg + Spark builtin aggregate
    * names plus this engine's registered aggregates. */
  private val aggNames: Set[String] = Set(
    "max", "min", "sum", "avg", "mean", "count", "count_if", "any", "some",
    "every", "bool_and", "bool_or", "any_value", "first", "first_value",
    "last", "last_value", "stddev", "stddev_pop", "stddev_samp", "std",
    "variance", "var_pop", "var_samp", "skewness", "kurtosis", "corr",
    "covar_pop", "covar_samp", "regr_avgx", "regr_avgy", "regr_count",
    "regr_intercept", "regr_r2", "regr_slope", "regr_sxx", "regr_sxy",
    "regr_syy", "string_agg", "array_agg", "jsonb_agg", "jsonb_object_agg",
    "map_agg", "list_agg", "listagg", "collect_list", "collect_set",
    "json_agg", "json_object_agg", "json_arrayagg", "json_objectagg",
    "xmlagg",
    "mode", "median", "percentile", "percentile_approx", "percentile_cont",
    "percentile_disc", "approx_count_distinct", "approx_percentile",
    "bit_and", "bit_or", "bit_xor", "bitmap_construct_agg", "bitmap_or_agg",
    "grouping", "grouping_id", "histogram_numeric", "hll_sketch_agg",
    "hll_union_agg", "max_by", "min_by", "sum_distinct", "try_avg",
    "try_sum", "array_concat_agg")

  private def containsAggFn(e: Expression): Boolean = e.exists {
    case f: UnresolvedFunction =>
      aggNames.contains(f.nameParts.last.toLowerCase) || f.isDistinct
    case _ => false
  }

  private def hasWindow(e: Expression): Boolean =
    e.exists(x => x.getClass.getSimpleName.contains("Window"))
}
