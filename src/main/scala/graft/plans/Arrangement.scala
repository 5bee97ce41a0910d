package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** `ArrangeBy{keys}` analog (reference `src/expr/src/relation.rs:303-308`):
  * the reference builds a shared in-memory index (arrangement) on a key so
  * multiple dataflows reuse it (`doc/developer/arrangements.md`). Spark's
  * equivalent: hash-repartition on the key and pin the result, so every
  * downstream join/agg on that key reuses one shuffle (exchange reuse) and
  * co-located partitions join without movement.
  *
  * Scale notes: StorageLevel.MEMORY_AND_DISK spills gracefully; the
  * partitioning survives in the plan, so Catalyst elides the exchange for
  * key-compatible consumers.
  */
object Arrangement {

  def arrangeBy(df: DataFrame, keys: String*): DataFrame =
    df.repartition(keys.map(col).toIndexedSeq: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

  def release(df: DataFrame): Unit = { df.unpersist(); () }
}
