package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases at
  * runtime (enabled in GraftSession), but salting is the planning-time tool
  * when ONE side is known to concentrate on hot keys: the build side is
  * replicated `factor`× (one copy per salt), the probe side spreads its hot
  * rows deterministically across the salts, so a key that previously landed
  * on one reducer now occupies `factor` partitions.
  *
  * The salt is `pmod(hash(probe-row columns), factor)` — deterministic, so
  * results are reproducible and verifiable against an unsalted oracle. At
  * 100 TB: replication cost is `factor × |build|` (choose the SMALLER side
  * as build), probe stays unreplicated; both sides shuffle on
  * `(key, salt)` — no single-partition hotspot survives.
  */
object SkewJoin {

  private val SaltCol = "__salt"

  /** Inner equi-join of `probe ⋈ build` on `keys`, spreading each probe key
    * across `factor` salted partitions. Column sets must be disjoint apart
    * from `keys`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    require(factor > 0)
    val probeCols: Seq[Column] = probe.columns.filterNot(_ == SaltCol).map(col).toSeq
    val salted = probe.withColumn(SaltCol,
      pmod(hash(probeCols: _*), lit(factor)))
    val replicated = build.withColumn(SaltCol,
      explode(expr(s"sequence(0, ${factor - 1})")))
    // Salting only matters in the shuffled regime — a broadcast join has no
    // per-reducer hotspot (and Catalyst would happily broadcast a small
    // replicated side at test scale, hiding the plan being demonstrated).
    salted.join(replicated.hint("shuffle_hash"), keys :+ SaltCol, "inner").drop(SaltCol)
  }
}
