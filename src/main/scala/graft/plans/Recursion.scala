package graft.plans

import org.apache.spark.sql.DataFrame

/** `WITH MUTUALLY RECURSIVE` / `LetRec` analog
  * (reference `src/expr/src/relation.rs:154-166`).
  *
  * Spark has no recursive-plan primitive, so we run a driver-side
  * **semi-naive** fixpoint: each round only the newly-discovered rows
  * (`delta`) feed the step function, and iteration stops when no new rows
  * appear or `maxIter` is hit (the reference's per-binding `limits`).
  *
  * Scale notes: `localCheckpoint` truncates lineage each round — without it
  * the plan tree grows linearly with iterations and planning cost explodes.
  * Each round is a distributed distinct + except; state lives in executors,
  * never on the driver.
  */
object Recursion {

  /** Least fixpoint of `base ∪ step(·)` under set semantics. */
  def fixpoint(base: DataFrame, step: DataFrame => DataFrame, maxIter: Int = 100): DataFrame = {
    var all = base.distinct().localCheckpoint(true)
    var frontier = all
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      val delta = step(frontier).distinct().except(all).localCheckpoint(true)
      if (delta.isEmpty) return all
      all = all.union(delta).localCheckpoint(true)
      frontier = delta
      i += 1
    }
    all
  }
}
