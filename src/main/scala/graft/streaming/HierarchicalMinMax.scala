package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental min/max maintenance under retractions — the reference's
  * **hierarchical** reduction class (`ReductionType::Hierarchical`,
  * `src/compute-types/src/plan/reduce.rs:89-102`; tournament-tree render
  * `src/compute/src/render/reduce.rs:40-50`). min/max are not invertible, so
  * a retraction of the current extremum forces recomputation over the key's
  * remaining values; the reference keeps a per-key tree so that recompute is
  * O(log n). Here the per-key state is the value multiset (value → net
  * multiplicity); extrema recompute over the distinct values of ONE key only
  * — state is partitioned by key across executors, and a retraction touches
  * exactly one key's multiset, never the collection.
  *
  * Output is the changelog of the maintained `(key, min, max)` view:
  * retract-old / insert-new pairs per touched key, empty for no-op batches —
  * the same contract as [[IncrementalReduce.accumulableChangelogStream]].
  */
object HierarchicalMinMax {

  /** Monotonic (append-only) min/max — the reference's `MonotonicTop1` plan
    * (`src/compute-types/src/plan/top_k.rs:28-35`): when
    * [[graft.plans.MonotonicAnalysis]] proves the input never retracts,
    * state shrinks from a value multiset to a single (min, max) pair — O(1)
    * per key instead of O(distinct values). Negative diffs are rejected
    * loudly (the planner must not have chosen this path). */
  def monotonicMinMaxStream[K](deltas: Dataset[(K, Double, Long)])(
      implicit ke: Encoder[K],
      ine: Encoder[(K, Double, Long)],
      ste: Encoder[(Double, Double)],
      oute: Encoder[(K, Double, Double, Long)]): Dataset[(K, Double, Double, Long)] = {
    deltas
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Double, Long)], state: GroupState[(Double, Double)]) =>
          val old = state.getOption
          var cur = old
          rows.foreach { case (_, v, diff) =>
            require(diff > 0, s"monotonic min/max plan received a retraction for key $key")
            cur = cur match {
              case None => Some((v, v))
              case Some((mn, mx)) => Some((math.min(mn, v), math.max(mx, v)))
            }
          }
          cur.foreach(state.update)
          if (old == cur) Iterator.empty
          else
            (old.map { case (mn, mx) => (key, mn, mx, -1L) } ++
              cur.map { case (mn, mx) => (key, mn, mx, 1L) }).iterator
      }
  }

  def minMaxChangelogStream[K](deltas: Dataset[(K, Double, Long)])(
      implicit ke: Encoder[K],
      ine: Encoder[(K, Double, Long)],
      ste: Encoder[Map[Double, Long]],
      oute: Encoder[(K, Double, Double, Long)]): Dataset[(K, Double, Double, Long)] = {
    deltas
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Double, Long)], state: GroupState[Map[Double, Long]]) =>
          val old = state.getOption.getOrElse(Map.empty[Double, Long])
          var multiset = old
          rows.foreach { case (_, v, diff) =>
            val n = multiset.getOrElse(v, 0L) + diff
            multiset = if (n == 0L) multiset - v else multiset.updated(v, n)
          }
          require(multiset.values.forall(_ > 0),
            s"negative multiplicity in min/max state for key $key")
          val oldExtrema =
            if (old.isEmpty) None else Some((old.keys.min, old.keys.max))
          val newExtrema =
            if (multiset.isEmpty) None else Some((multiset.keys.min, multiset.keys.max))
          if (multiset.isEmpty) state.remove() else state.update(multiset)
          if (oldExtrema == newExtrema) Iterator.empty
          else
            (oldExtrema.map { case (mn, mx) => (key, mn, mx, -1L) } ++
              newExtrema.map { case (mn, mx) => (key, mn, mx, 1L) }).iterator
      }
  }
}
