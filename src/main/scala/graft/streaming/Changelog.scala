package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (diff-multiset) algebra.
  *
  * The reference's native data model is a multiset of rows with signed
  * multiplicities — updates are `(row, timestamp, diff)` triples
  * (reference `src/repr/src/diff.rs`; `src/expr/src/relation.rs:278-297` for
  * Negate/Threshold/Union). We model the same thing as a DataFrame with an
  * explicit `diff: Long` column; these operators work identically on batch
  * DataFrames and (where Spark allows the aggregation) streaming ones.
  *
  * Scale notes: `consolidate` is a single hash aggregation over all columns —
  * map-side partial aggregation keeps the shuffle proportional to distinct
  * rows, not input rows. No driver-side state.
  */
object Changelog {
  val DiffCol = "diff"

  /** Attach diff=+1 to a plain relation, making it a changelog. */
  def fromRows(df: DataFrame): DataFrame = df.withColumn(DiffCol, lit(1L))

  /** `Negate` (relation.rs:278-281): flip multiplicities. */
  def negate(df: DataFrame): DataFrame =
    df.withColumn(DiffCol, -col(DiffCol))

  /** Multiset `Union` (relation.rs:292-297): multiplicities add. */
  def unionAll(dfs: DataFrame*): DataFrame = dfs.reduce(_.unionByName(_))

  /** Sum multiplicities per distinct row; drop rows with net 0.
    * (The analog of differential dataflow's consolidation.) */
  def consolidate(df: DataFrame): DataFrame = {
    val keys = df.columns.filterNot(_ == DiffCol).map(col)
    df.groupBy(keys.toIndexedSeq: _*)
      .agg(sum(DiffCol).as(DiffCol))
      .filter(col(DiffCol) =!= 0L)
  }

  /** `Threshold` (relation.rs:285-288): keep rows with positive net
    * multiplicity (at their net multiplicity). */
  def threshold(df: DataFrame): DataFrame =
    consolidate(df).filter(col(DiffCol) > 0L)

  /** Distinct over a changelog: net-positive rows at multiplicity 1. */
  def distinctRows(df: DataFrame): DataFrame =
    threshold(df).withColumn(DiffCol, lit(1L))

  /** Collapse a changelog back to a plain relation by expanding positive
    * multiplicities (the reference's `RepeatRow` table function,
    * `src/expr/src/relation/func.rs:3611-3614`). */
  def toRows(df: DataFrame): DataFrame = {
    val cols = df.columns.filterNot(_ == DiffCol).map(col)
    threshold(df)
      .withColumn("__rep", explode(array_repeat(lit(1), col(DiffCol).cast("int"))))
      .select(cols.toIndexedSeq: _*)
  }
}
