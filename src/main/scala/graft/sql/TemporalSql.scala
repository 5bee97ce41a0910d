package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}

import graft.views.TemporalView

/** `mz_now()` temporal filters in SQL text — the reference's user surface
  * for scheduled retractions (`doc/user/content/transform-data/patterns/
  * temporal-filters.md`): a predicate `mz_now() <= <deadline expr>` inside
  * `CREATE MATERIALIZED VIEW` is compiled OUT of the row logic and INTO the
  * timestamp domain (`MfpPlan::extract_temporal`, reference
  * `src/expr/src/linear.rs:411-470`).
  *
  * Spark-first: the extraction runs on the PARSED logical plan, not the SQL
  * text — each `Filter` is split into its conjuncts, the `mz_now() <= e`
  * (or mirrored `e >= mz_now()`) conjunct is removed, and the deadline `e`
  * is appended as the stamped `__expires_at` projection
  * ([[TemporalView.ExpiresCol]]). The resulting plan feeds the existing
  * [[TemporalView]] machinery: version commits retract expired rows without
  * re-evaluating the defining query, and the retractions surface in
  * SUBSCRIBE frames as `mz_diff = -1`.
  *
  * The logical clock is pinned per statement: `spark.graft.mz_now`
  * (format `yyyy-MM-dd HH:mm:ss`) when set — the deterministic test/oracle
  * path — else the wall clock, matching the reference where `mz_now()` is
  * the refresh timestamp. `ADVANCE MATERIALIZED VIEW v TO TIMESTAMP '...'`
  * moves the clock forward.
  */
object TemporalSql {

  private def isMzNow(e: Expression): Boolean = e match {
    case f: UnresolvedFunction =>
      f.nameParts.map(_.toLowerCase) == Seq("mz_now") && f.arguments.isEmpty
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Upper bound: `mz_now() <= e` / `e >= mz_now()` keeps a row alive while
    * the clock has not passed `e` — [[TemporalView]]'s
    * `__expires_at >= clock` retention rule. */
  private def upperOf(conjunct: Expression): Option[Expression] = conjunct match {
    case LessThanOrEqual(l, r) if isMzNow(l) => Some(r)
    case GreaterThanOrEqual(l, r) if isMzNow(r) => Some(l)
    case _ => None
  }

  /** Lower bound: `mz_now() >= e` / `e <= mz_now()` makes a row APPEAR once
    * the clock reaches `e` — scheduled future insertion, the reference's
    * `lower_bounds` list (`src/expr/src/linear.rs:1727-1730`; hopping-window
    * starts, delayed appearance). Compiled to [[TemporalView.AppearsCol]]:
    * rows with a future `__appears_at` wait in the pending state and enter
    * the visible view (diff = +1 in SUBSCRIBE) at the ADVANCE that crosses
    * their bound. */
  private def lowerOf(conjunct: Expression): Option[Expression] = conjunct match {
    case GreaterThanOrEqual(l, r) if isMzNow(l) => Some(r)
    case LessThanOrEqual(l, r) if isMzNow(r) => Some(l)
    case _ => None
  }

  /** Does the plan mention mz_now() anywhere? (Cheap pre-check + guard for
    * placements the extraction does not support.) */
  def mentionsMzNow(plan: LogicalPlan): Boolean =
    plan.exists(_.expressions.exists(_.exists(isMzNow)))

  /** Extract the temporal predicate: returns the plan with the mz_now
    * conjunct removed and the deadline stamped as `__expires_at`, or None if
    * the plan has no mz_now(). Throws on shapes that would silently change
    * semantics (mz_now outside a WHERE conjunct of the supported form). */
  def extract(plan: LogicalPlan): Option[LogicalPlan] = {
    if (!mentionsMzNow(plan)) return None
    var uppers = List.empty[Expression]
    var lowers = List.empty[Expression]
    val stripped = plan.transformUp {
      case Filter(cond, child) if cond.exists(isMzNow) =>
        val (temporal, rest) = splitConjuncts(cond).partition(_.exists(isMzNow))
        temporal.foreach { c =>
          upperOf(c) match {
            case Some(e) => uppers ::= e
            case None => lowerOf(c) match {
              case Some(e) => lowers ::= e
              case None => throw new IllegalArgumentException(
                s"unsupported mz_now() predicate: ${c.sql}. Supported WHERE " +
                  "conjuncts: mz_now() <= <expr> (expiry) and " +
                  "mz_now() >= <expr> (delayed appearance)")
            }
          }
        }
        rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)
    }
    if (stripped.exists(_.expressions.exists(_.exists(isMzNow))))
      throw new IllegalArgumentException(
        "mz_now() is only supported inside WHERE conjuncts of the form " +
          "mz_now() <= <expr> / mz_now() >= <expr>")
    if (uppers.isEmpty && lowers.isEmpty)
      throw new IllegalStateException("unreachable: mz_now with no bound")
    def reduceWith(fn: String, es: List[Expression]): Expression =
      es.reduce((a, b) => UnresolvedFunction(Seq(fn), Seq(a, b), isDistinct = false))
    // several upper bounds: the row expires at the EARLIEST deadline; a
    // view with only lower bounds never expires (far-future sentinel)
    val expires =
      if (uppers.nonEmpty) reduceWith("least", uppers)
      else org.apache.spark.sql.catalyst.expressions.Literal.create(
        java.sql.Timestamp.valueOf("9999-12-31 00:00:00"))
    // several lower bounds: the row appears at the LATEST one
    val appears = lowers match {
      case Nil => None
      case ls => Some(reduceWith("greatest", ls))
    }
    Some(Project(
      UnresolvedStar(None) +:
        (Alias(expires, TemporalView.ExpiresCol)() +:
          appears.map(a => Alias(a, TemporalView.AppearsCol)()).toSeq),
      stripped))
  }

  /** The pinned logical clock for a statement executed now. The pin is
    * either a timestamp string (temporal-view fixtures) or epoch millis
    * (the SLT runner's per-query pin, MzNowExpression's native form). */
  def currentClock(spark: SparkSession): String = {
    def fmt(millis: Long) =
      new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
        .format(new java.util.Date(millis))
    spark.conf.getOption("spark.graft.mz_now") match {
      case Some(p) if p.matches("\\d+") => fmt(p.toLong)
      case Some(p) => p
      case None => fmt(System.currentTimeMillis())
    }
  }

  /** Materialize a (possibly unresolved) logical plan in `session`. */
  def toDf(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.GraftPlanBridge.ofRows(session, plan)
}
