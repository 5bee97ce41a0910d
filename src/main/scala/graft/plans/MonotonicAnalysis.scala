package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnaryMinus}

import graft.streaming.Changelog

/** Monotonicity (append-only) analysis — the reference's
  * `src/transform/src/monotonic.rs` marks subgraphs whose collections only
  * ever grow, letting Reduce/TopK render without retraction machinery
  * (`MonotonicTop1/MonotonicTopK`, `src/compute-types/src/plan/top_k.rs:28-35`).
  *
  * In our changelog model a plan is monotonic iff no operator can emit a
  * negative `diff`: batch sources are insert-only by construction
  * ([[Changelog.fromRows]] stamps diff=+1), and the only sign-flipping
  * operator is [[Changelog.negate]] (`-diff`). The analysis therefore scans
  * the analyzed plan for a negation of the diff column. Upsert envelopes
  * emit retractions through typed Datasets (flatMapGroupsWithState), which
  * this plan-level scan cannot see — callers must treat upsert-derived
  * changelogs as non-monotonic (they are), per the API contract on
  * [[graft.streaming.UpsertEnvelope]].
  *
  * Consumers use the flag to pick the cheap state shape: see
  * [[graft.streaming.HierarchicalMinMax.monotonicMinMaxStream]] — O(1)
  * (min,max) state instead of a per-key value multiset.
  */
object MonotonicAnalysis {

  def isMonotonic(df: DataFrame): Boolean =
    !df.queryExecution.analyzed.exists(p => p.expressions.exists(_.exists {
      case UnaryMinus(a: Attribute, _) => a.name == Changelog.DiffCol
      case _ => false
    }))
}
