package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._

import graft.streaming.Changelog

/** Non-negativity analysis for the changelog diff column — the reference's
  * `src/transform/src/analysis/non_negative.rs`, which feeds
  * `threshold_elision.rs`: a Threshold over a collection that provably has
  * no negative multiplicities is the identity.
  *
  * This is POSITIVE provenance tracking: the diff attribute is followed by
  * `ExprId` down the analyzed plan, and only constructions that preserve
  * non-negativity prove — a literal ≥ 0 (what [[Changelog.fromRows]]
  * stamps), a pass-through Attribute, a product or sum of proven terms, a
  * count. Anything unrecognized (a negation, `diff * -1`, an opaque typed
  * operator like flatMapGroupsWithState, a re-read parquet changelog) is
  * NOT provable and the conservative answer is false. This replaces the old
  * scan-for-UnaryMinus heuristic, which wrongly classified any negation it
  * didn't syntactically recognize as monotonic.
  */
object DiffProvenance {

  /** Is column `name` provably ≥ 0 (and non-null) in every row of `df`? */
  def nonNegative(df: DataFrame, name: String = Changelog.DiffCol): Boolean = {
    val plan = df.queryExecution.analyzed
    plan.output.find(_.name == name).exists(a => prove(plan, a.exprId))
  }

  private def prove(plan: LogicalPlan, id: ExprId): Boolean = plan match {
    case Project(list, child) =>
      list.find(_.exprId == id) match {
        case Some(a: Attribute) => prove(child, a.exprId)
        case Some(Alias(e, _)) => proveExpr(e, child)
        case _ => false
      }
    case Filter(_, c) => prove(c, id)
    case SubqueryAlias(_, c) => prove(c, id)
    case Distinct(c) => prove(c, id)
    case s: Sort => prove(s.child, id)
    case l: GlobalLimit => prove(l.child, id)
    case l: LocalLimit => prove(l.child, id)
    case r: Repartition => prove(r.child, id)
    case r: RepartitionByExpression => prove(r.child, id)
    case d: Deduplicate => prove(d.child, id)
    case u: Union =>
      val idx = u.output.indexWhere(_.exprId == id)
      idx >= 0 && u.children.forall(c => prove(c, c.output(idx).exprId))
    case j: Join =>
      // outer sides can null the attribute, which breaks `> 0` filters;
      // only sides that cannot be null-extended prove
      def fromSide(side: LogicalPlan): Boolean =
        side.output.exists(_.exprId == id) && prove(side, id)
      j.joinType match {
        case Inner | Cross => fromSide(j.left) || fromSide(j.right)
        case LeftSemi | LeftAnti | LeftOuter => fromSide(j.left)
        case RightOuter => fromSide(j.right)
        case _ => false
      }
    case a: Aggregate =>
      a.aggregateExpressions.find(_.exprId == id) match {
        case Some(att: Attribute) => prove(a.child, att.exprId) // grouping col
        case Some(Alias(e, _)) => proveExpr(e, a.child)
        case _ => false
      }
    case _ => false
  }

  private def proveExpr(e: Expression, child: LogicalPlan): Boolean = e match {
    case Literal(null, _) => false
    case Literal(v: Long, _) => v >= 0L
    case Literal(v: Int, _) => v >= 0
    case Literal(v: Short, _) => v >= 0
    case Literal(v: Byte, _) => v >= 0
    case a: Attribute => prove(child, a.exprId)
    case Alias(e2, _) => proveExpr(e2, child)
    // Only sign-preserving (widening) casts keep provenance: a narrowing
    // cast like `cast(bigintDiff as int)` wraps values above 2³¹ negative
    // while the child still "proves" ≥ 0 — eliding a Threshold that in fact
    // cancels. Conservative answer for everything else is false.
    case c: Cast if widens(c.child.dataType, c.dataType) => proveExpr(c.child, child)
    case m: Multiply => proveExpr(m.left, child) && proveExpr(m.right, child)
    case ad: Add => proveExpr(ad.left, child) && proveExpr(ad.right, child)
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case s: Sum => proveExpr(s.child, child) // sum of non-negatives
        case _: Count => true
        case m: Min => proveExpr(m.child, child)
        case m: Max => proveExpr(m.child, child)
        case _ => false
      }
    case _ => false
  }

  import org.apache.spark.sql.types._
  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** Can `to` represent every value of `from` without sign change?
    * Integral widening is exact; integral→float/double and float→double may
    * round but never flip sign, which is all non-negativity needs. */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    case (f, t) if integralRank.contains(f) && integralRank.contains(t) =>
      integralRank(f) <= integralRank(t)
    case (f, FloatType | DoubleType) if integralRank.contains(f) => true
    case (FloatType, DoubleType) => true
    case (f, d: DecimalType) if integralRank.contains(f) =>
      d.precision - d.scale >= 19 // room for any Long
    case (f: DecimalType, t: DecimalType) =>
      t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale
    case _ => false
  }
}
