package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, IncrementalJoin}

/** Continuously maintained JOIN view — the MV lifecycle composed with the
  * incremental-join delta rule (reference: a materialized view over a join
  * is a persist-backed dataflow whose join operator updates incrementally,
  * `src/compute/src/sink/materialized_view.rs` + `render/join/`).
  *
  * Three versioned collections live in the [[ViewCatalog]]:
  * `<name>__a`, `<name>__b` (consolidated input changelogs) and
  * `<name>__out` (the consolidated join changelog). Each [[applyBatch]]
  * evaluates ONLY delta-sized joins (δA⋈B ∪ A⋈δB ∪ δA⋈δB), merges, and
  * commits all three atomically-per-collection as new versions — readers of
  * the previous versions stay consistent, exactly the persist-sink
  * guarantee. The full A⋈B is computed once at [[initialize]] and never
  * again.
  */
final class MaintainedJoin(
    catalog: ViewCatalog,
    name: String,
    keys: Seq[String]) {

  private val aName = s"${name}__a"
  private val bName = s"${name}__b"
  private val outName = s"${name}__out"

  /** Register the two inputs (plain relations) and materialize the initial
    * join state. */
  def initialize(a: DataFrame, b: DataFrame): Unit = {
    val aCl = Changelog.consolidate(Changelog.fromRows(a))
    val bCl = Changelog.consolidate(Changelog.fromRows(b))
    catalog.createMaterializedView(aName, _ => aCl)
    catalog.createMaterializedView(bName, _ => bCl)
    catalog.createMaterializedView(outName, _ =>
      Changelog.consolidate(
        IncrementalJoin.joinChangelogs(catalog.table(aName), catalog.table(bName), keys)))
  }

  /** Advance the view by one batch of input changelogs (either may be
    * empty). Work is proportional to |δ| × matches, never |A⋈B|. */
  def applyBatch(aDelta: DataFrame, bDelta: DataFrame): Unit = {
    val aState = catalog.table(aName)
    val bState = catalog.table(bName)
    val outDelta = IncrementalJoin.delta(aState, aDelta, bState, bDelta, keys)
    catalog.createMaterializedView(outName, _ =>
      Changelog.consolidate(catalog.table(outName).unionByName(outDelta)))
    catalog.createMaterializedView(aName, _ =>
      Changelog.consolidate(aState.unionByName(aDelta)))
    catalog.createMaterializedView(bName, _ =>
      Changelog.consolidate(bState.unionByName(bDelta)))
  }

  /** The maintained join as a plain relation (positive-multiplicity rows). */
  def output: DataFrame = {
    val out = catalog.table(outName)
    out.filter(col(Changelog.DiffCol) > 0)
  }

  def outputVersion: Option[Long] = catalog.currentVersion(outName)

  /** Continuous operation: attach a STREAMING tagged changelog
    * (`__src ∈ {a, b}` + the union of both sides' columns + diff) and apply
    * each micro-batch through the delta rule — Structured Streaming's
    * foreachBatch is the reference's "dataflow keeps running" loop, the
    * micro-batch boundary its timestamp. Spark allows one sink per query,
    * so the two inputs arrive as one tagged union (disjoint non-key columns
    * null on the other side's rows). */
  def attachStream(tagged: DataFrame, name: String,
      aCols: Seq[String], bCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    tagged.writeStream
      .queryName(name)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF().persist()
        try {
          applyBatch(
            b.filter(col("__src") === "a").select(aCols.map(col): _*),
            b.filter(col("__src") === "b").select(bCols.map(col): _*))
        } finally { b.unpersist(); () }
      }
      .start()
}
