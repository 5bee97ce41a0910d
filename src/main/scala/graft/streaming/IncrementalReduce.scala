package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental maintenance of **accumulable** aggregates (sum/count and
  * everything derivable: avg, stddev) under arbitrary insert/retract
  * changelogs — the reference's `ReductionType::Accumulable`
  * (reference `src/compute-types/src/plan/reduce.rs:89-102`,
  * `src/compute/src/render/reduce.rs`).
  *
  * Accumulable aggregates are invertible: a retraction `(row, -1)` is handled
  * by adding `-value`. Hierarchical aggregates (min/max) are NOT invertible
  * and need recompute-per-key — keep them recompute-only (SURVEY §7.4).
  *
  * Batch form: one `groupBy` with diff-weighted sums — a single shuffle with
  * map-side partial aggregation, scale-safe. Streaming form: per-key running
  * sums in keyed state via `flatMapGroupsWithState`.
  */
object IncrementalReduce {

  /** Batch: changelog (cols..., valueCol, diff) → per-key sum/count/avg that
    * respect multiplicities, keeping only keys with net-positive support. */
  def accumulable(changelog: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val d = col(Changelog.DiffCol)
    changelog
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(
        sum(d).as("support"),
        sum(col(valueCol) * d).as("sum_val"))
      .filter(col("support") > 0)
      .withColumn("avg_val", col("sum_val") / col("support"))
  }

  /** Streaming: per touched key, emit the FULL changelog of the maintained
    * aggregate — a retraction `(old_row, -1)` followed by an insertion
    * `(new_row, +1)` — exactly what a downstream SUBSCRIBE consumer needs to
    * mirror the view (reference `sink/subscribe.rs`: subscribes receive the
    * view's update stream, not its state). Output tuples are
    * `(key, support, total, diff)`; a key whose support drops to ≤ 0 emits
    * only the retraction. */
  def accumulableChangelogStream[K](deltas: org.apache.spark.sql.Dataset[(K, Double, Long)])(
      implicit ke: Encoder[K],
      ine: Encoder[(K, Double, Long)],
      ste: Encoder[(Long, Double)],
      oute: Encoder[(K, Long, Double, Long)]): org.apache.spark.sql.Dataset[(K, Long, Double, Long)] = {
    deltas
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Double, Long)], state: GroupState[(Long, Double)]) =>
          val old = state.getOption
          var (support, total) = old.getOrElse((0L, 0.0))
          rows.foreach { case (_, v, diff) =>
            support += diff
            total += v * diff
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Double, Long)]
          if (!old.contains((support, total))) { // no-op batches consolidate to nothing
            old.foreach { case (s0, t0) => out += ((key, s0, t0, -1L)) }
            if (support <= 0) state.remove()
            else {
              state.update((support, total))
              out += ((key, support, total, 1L))
            }
          }
          out.iterator
      }
  }

  /** Streaming: keyed running (count, sum) state updated by each delta batch;
    * emits the new aggregate row per touched key (changelog of the view). */
  def accumulableStream[K](deltas: org.apache.spark.sql.Dataset[(K, Double, Long)])(
      implicit ke: Encoder[K],
      ine: Encoder[(K, Double, Long)],
      ste: Encoder[(Long, Double)],
      oute: Encoder[(K, Long, Double)]): org.apache.spark.sql.Dataset[(K, Long, Double)] = {
    deltas
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Double, Long)], state: GroupState[(Long, Double)]) =>
          var (support, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v, diff) =>
            support += diff
            total += v * diff
          }
          if (support <= 0) { state.remove(); Iterator.empty }
          else { state.update((support, total)); Iterator.single((key, support, total)) }
      }
  }
}
