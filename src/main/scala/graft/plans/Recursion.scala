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

  /** Least fixpoint of `base ∪ step(·)` under set semantics.
    *
    * REQUIRES a **linear** step: the semi-naive loop feeds only the
    * newly-discovered delta to `step`, which computes the true fixpoint only
    * when `step` distributes over union (`step(A ∪ B) = step(A) ∪ step(B)`)
    * — e.g. `frontier ⋈ static_edges`. A non-linear step (frontier joined
    * with itself, as in `path ⋈ path` transitive closure) must use
    * [[fixpointNonLinear]], which feeds the full accumulated set each round.
    *
    * Hitting `maxIter` without convergence (the reference's per-binding
    * `limits`, relation.rs:154-166, which also truncates silently by default)
    * logs a warning; pass `requireConvergence = true` to raise instead.
    */
  def fixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 100,
      requireConvergence: Boolean = false): DataFrame = {
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
    if (i == maxIter && !frontier.isEmpty) {
      val msg = s"Recursion.fixpoint: maxIter=$maxIter reached without convergence; " +
        "result is truncated (the reference's LetRec `limits` semantics)"
      if (requireConvergence) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARN $msg")
    }
    all
  }

  /** Per-binding iteration cap — the reference's `LetRecLimit`
    * (relation.rs:154-166): after `maxIters` rounds the binding freezes at
    * its current value while others continue. */
  final case class LetRecLimit(maxIters: Int)

  /** `WITH MUTUALLY RECURSIVE` (reference `LetRec`, relation.rs:154-166):
    * N bindings re-evaluated JOINTLY until every binding is stable —
    * `X_j^{t+1} = step_j(X_1^t … X_N^t)`, general fixed-point iteration
    * (each step sees all current bindings; steps typically include their
    * base as `base ∪ …`, matching the reference's recomputation semantics
    * rather than blind accumulation).
    *
    * `limits(j)` freezes binding j after its round cap (per-binding
    * `LetRecLimit`); the global `maxIter` guards divergence like
    * [[fixpoint]]. Each round is distributed (distinct + exceptAll on
    * executors, localCheckpoint lineage truncation); the driver only
    * orchestrates. */
  def mutualFixpoint(
      bases: Seq[DataFrame],
      step: Seq[DataFrame] => Seq[DataFrame],
      limits: Seq[Option[LetRecLimit]] = Nil,
      maxIter: Int = 100,
      requireConvergence: Boolean = false): Seq[DataFrame] = {
    require(bases.nonEmpty)
    val lim: Seq[Option[LetRecLimit]] =
      if (limits.isEmpty) Seq.fill(bases.size)(None) else limits
    var cur = bases.map(_.distinct().localCheckpoint(true))
    val frozen = Array.fill(bases.size)(false)
    var i = 0
    while (i < maxIter) {
      val proposed = step(cur)
      require(proposed.size == cur.size, "step must return one plan per binding")
      val next = proposed.zip(cur).zipWithIndex.map { case ((n, c), j) =>
        if (frozen(j)) c else n.distinct().localCheckpoint(true)
      }
      val changed = next.zip(cur).zipWithIndex.exists { case ((n, c), j) =>
        // one job per binding: symmetric difference, then emptiness
        !frozen(j) && !n.exceptAll(c).unionByName(c.exceptAll(n)).isEmpty
      }
      cur = next
      i += 1
      lim.zipWithIndex.foreach { case (l, j) =>
        if (l.exists(_.maxIters <= i)) frozen(j) = true
      }
      if (!changed) return cur
    }
    val msg = s"Recursion.mutualFixpoint: maxIter=$maxIter reached without convergence; " +
      "result is truncated (the reference's LetRec limits semantics)"
    if (requireConvergence) throw new IllegalStateException(msg)
    else System.err.println(s"[graft] WARN $msg")
    cur
  }

  /** Fixpoint for NON-linear steps: `step` receives the full accumulated
    * collection every round (naive iteration — correct for any monotone
    * step, at the cost of recomputing over the whole set each round). */
  def fixpointNonLinear(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 100,
      requireConvergence: Boolean = false): DataFrame = {
    var all = base.distinct().localCheckpoint(true)
    var i = 0
    while (i < maxIter) {
      val delta = step(all).distinct().except(all).localCheckpoint(true)
      if (delta.isEmpty) return all
      all = all.union(delta).localCheckpoint(true)
      i += 1
    }
    val msg = s"Recursion.fixpointNonLinear: maxIter=$maxIter reached without convergence; " +
      "result is truncated"
    if (requireConvergence) throw new IllegalStateException(msg)
    else System.err.println(s"[graft] WARN $msg")
    all
  }
}
