package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Sidecar unique-key catalog — the reference keeps key sets in
  * `SqlRelationType::keys` (reference `src/repr/src/relation.rs:210`) and
  * feeds them to transforms; Catalyst has no native home for unique-key
  * metadata, so this registry carries it (SURVEY §1.1). Keys are column-name
  * sets; the TPC-H-style schema keeps column names globally unique, which is
  * what lets the rule match by name (a production version would tag keys per
  * relation id).
  *
  * Register only NON-NULLABLE keys (primary keys). A nullable UNIQUE column
  * admits duplicate NULLs, so eliding a Reduce grouped on it would leak
  * them — the exact trap cockroach/distinct.slt's regression #44296 pins
  * (crdb and the reference both exhibit it; we refuse by contract).
  */
object UniqueKeys {
  private val keys = TrieMap.empty[String, Set[String]]

  // the driver test schema's primary keys
  Seq("n_nationkey", "r_regionkey", "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "event_id", "doc_id", "vec_id")
    .foreach(k => keys.put(k, Set(k)))

  def register(name: String, keyCols: Set[String]): Unit = keys.put(name, keyCols)
  def registered: Iterable[Set[String]] = keys.values
  def clear(): Unit = keys.clear()
}

/** Unique-key Reduce elision (reference
  * `src/transform/src/reduce_elision.rs`): a `GROUP BY` whose grouping
  * columns include a unique key of a single-relation input has exactly one
  * row per group, so the Aggregate collapses to a Project —
  * `count(*) → 1`, `sum(x) → x`, `min/max(x) → x`, `avg(x) → x` — removing
  * a full shuffle. Catalyst has no unique-key notion, hence this custom
  * `Rule[LogicalPlan]`, injected via `SparkSessionExtensions`
  * (`GraftSession`).
  *
  * Fires only when the Aggregate's child is a Filter/Project chain over ONE
  * leaf relation (joins/unions can duplicate key values, aggregations can
  * drop them) and every aggregate is a supported, unfiltered function.
  */
object ReduceElisionRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Aggregate(grouping, aggExprs, child, _)
        if groupedByUniqueKey(grouping, child) && aggExprs.forall(rewritable) =>
      Project(aggExprs.map(rewriteTop), child)
  }

  private def singleRelationChain(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Filter(_, c) => singleRelationChain(c)
    case Project(_, c) => singleRelationChain(c)
    case SubqueryAlias(_, c) => singleRelationChain(c)
    case _ => false
  }

  private def groupedByUniqueKey(grouping: Seq[Expression], child: LogicalPlan): Boolean =
    singleRelationChain(child) && {
      val grouped = grouping.collect { case a: Attribute => a.name.toLowerCase }.toSet
      UniqueKeys.registered.exists(k => k.nonEmpty && k.subsetOf(grouped))
    }

  private def supportedAgg(ae: AggregateExpression): Boolean =
    ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Count | _: Sum | _: Min | _: Max | _: Average => true
      case _ => false
    })

  private def rewritable(ne: NamedExpression): Boolean =
    !ne.exists {
      case ae: AggregateExpression => !supportedAgg(ae)
      case _ => false
    }

  /** Replace each aggregate call with its single-row value. */
  private def rewriteAgg(ae: AggregateExpression): Expression =
    ae.aggregateFunction match {
      case Count(children) if children.forall(_.foldable) => Literal(1L)
      case Count(children) =>
        If(children.map(c => IsNull(c): Expression).reduce(Or), Literal(0L), Literal(1L))
      case s: Sum => Cast(s.child, ae.dataType)
      case m: Min => m.child
      case m: Max => m.child
      case a: Average => Cast(a.child, ae.dataType)
      case _ => ae
    }

  private def rewriteTop(ne: NamedExpression): NamedExpression = ne match {
    case a: Alias =>
      val rewritten = a.child.transformUp { case ae: AggregateExpression => rewriteAgg(ae) }
      a.withNewChildren(Seq(rewritten)).asInstanceOf[NamedExpression] // keeps exprId
    case other => other
  }
}
