package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Sidecar unique-key catalog — the reference keeps key sets in
  * `SqlRelationType::keys` (reference `src/repr/src/relation.rs:210`) and
  * feeds them to transforms; Catalyst has no native home for unique-key
  * metadata, so this registry carries it (SURVEY §1.1).
  *
  * Keys are tagged **per relation**: a registration pairs the relation's
  * full lower-cased column-name set (its signature) with its key columns.
  * A leaf plan only yields key attributes when its output covers a
  * registered signature — so an unrelated table that happens to reuse a key
  * column name (e.g. an SLT-created `t(event_id int)`) never matches.
  *
  * Register only NON-NULLABLE keys (primary keys). A nullable UNIQUE column
  * admits duplicate NULLs, so eliding a Reduce grouped on it would leak
  * them — the exact trap cockroach/distinct.slt's regression #44296 pins
  * (crdb and the reference both exhibit it; we refuse by contract).
  */
object UniqueKeys {
  /** relation signature (full column-name set) -> primary-key column set */
  private val keys = TrieMap.empty[Set[String], Set[String]]

  // the driver test schema's relations and primary keys (TESTDATA.md)
  Seq(
    Set("r_regionkey", "r_name") -> Set("r_regionkey"),
    Set("n_nationkey", "n_name", "n_regionkey") -> Set("n_nationkey"),
    Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment") -> Set("c_custkey"),
    Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal") -> Set("s_suppkey"),
    Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice") -> Set("p_partkey"),
    Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority") -> Set("o_orderkey"),
    Set("event_id", "ts", "user_id", "event_type", "value", "props") -> Set("event_id"),
    Set("doc_id", "text", "lang", "source", "n_chars") -> Set("doc_id"),
    Set("vec_id", "embedding", "label") -> Set("vec_id")
  ).foreach { case (sig, k) => keys.put(sig, k) }

  def register(signature: Set[String], keyCols: Set[String]): Unit =
    keys.put(signature.map(_.toLowerCase), keyCols.map(_.toLowerCase))

  /** The key set of the relation whose signature the given column set
    * covers, if any. */
  def keysFor(relationCols: Set[String]): Option[Set[String]] =
    keys.collectFirst { case (sig, k) if sig.subsetOf(relationCols) => k }

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
  * Key provenance is tracked by `ExprId`: a grouping attribute counts as a
  * key only if the SAME attribute (no intervening Alias — a rename or a
  * computed expression re-using a key name gets a fresh ExprId) flows up
  * unmodified from the leaf relation's key column.
  */
object ReduceElisionRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    // tree-pattern pruning: plans with no Aggregate anywhere (the common
    // case, e.g. every fixpoint micro-round) bail in O(1) on the node's
    // pattern bits instead of paying a full transformUp tree walk per
    // optimizer invocation
    plan.transformUpWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case Aggregate(grouping, aggExprs, child, _)
          if groupedByUniqueKey(grouping, child) && aggExprs.forall(rewritable) =>
        Project(aggExprs.map(rewriteTop), child)
    }

  /** Pristine key attributes visible at `p`: (ExprId -> leaf column name)
    * plus the full key set of the one underlying relation. Attributes
    * survive a Project only when referenced verbatim (same ExprId, not via
    * Alias). Returns None when the chain is not a single-relation
    * Filter/Project/SubqueryAlias tower or the leaf has no registered key.
    */
  private def pristineKeys(p: LogicalPlan): Option[(Map[ExprId, String], Set[String])] =
    p match {
      case l: LeafNode =>
        val cols = l.output.map(_.name.toLowerCase).toSet
        UniqueKeys.keysFor(cols).map { k =>
          val m = l.output.filter(a => k.contains(a.name.toLowerCase))
            .map(a => a.exprId -> a.name.toLowerCase).toMap
          (m, k)
        }
      case Filter(_, c) => pristineKeys(c)
      case SubqueryAlias(_, c) => pristineKeys(c)
      case Project(list, c) => pristineKeys(c).map { case (below, k) =>
        (list.collect {
          case a: Attribute if below.contains(a.exprId) => a.exprId -> below(a.exprId)
        }.toMap, k)
      }
      case _ => None
    }

  private def groupedByUniqueKey(grouping: Seq[Expression], child: LogicalPlan): Boolean =
    pristineKeys(child).exists { case (pk, keySet) =>
      val groupedKeyCols = grouping.collect {
        case a: Attribute if pk.contains(a.exprId) => pk(a.exprId)
      }.toSet
      keySet.nonEmpty && keySet.subsetOf(groupedKeyCols)
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
