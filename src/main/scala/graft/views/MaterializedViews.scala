package graft.views

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Changelog

/** Materialized-view lifecycle — the reference's defining feature:
  * `CREATE MATERIALIZED VIEW` registers a query whose result is continuously
  * maintained in durable storage and served consistently to readers
  * (reference `src/adapter/src/coord/sequencer/inner/create_materialized_view.rs`,
  * persist sink `src/compute/src/sink/materialized_view.rs`).
  *
  * Spark-first design:
  *  - **Persist** = versioned parquet directories `<base>/<name>/v=<n>/`.
  *    A refresh writes the NEW version completely, then atomically flips a
  *    one-line `_CURRENT` pointer (temp file + atomic rename). Readers
  *    resolve `_CURRENT` once per read, so every read sees one complete
  *    version — the analog of the reference's "every read sees a consistent
  *    frontier" guarantee. Old versions stay until `vacuum()`.
  *  - **Full refresh** re-runs the defining query (the reference's recompute
  *    path for non-incrementalizable plans).
  *  - **Incremental refresh** applies a `(row..., diff)` changelog batch
  *    through the accumulable-Reduce delta rule (merge by key, add diff-
  *    weighted sums, drop keys at support ≤ 0 — reference
  *    `ReductionType::Accumulable`, `src/compute-types/src/plan/reduce.rs:89-102`)
  *    without touching the base table. At 100 TB the merge is a single
  *    shuffle of |state| + |delta| keyed rows; state never transits the
  *    driver.
  */
final class ViewCatalog(spark: SparkSession, baseDir: String) {

  private val defs = TrieMap.empty[String, SparkSession => DataFrame]

  private def viewDir(name: String): Path = Paths.get(baseDir, name)
  private def currentFile(name: String): Path = viewDir(name).resolve("_CURRENT")

  /** Latest committed version, if the view has ever been written. */
  def currentVersion(name: String): Option[Long] = {
    val f = currentFile(name)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Write `df` as the next version and atomically flip the pointer. */
  private def commitVersion(name: String, df: DataFrame): Long = {
    val next = currentVersion(name).fold(0L)(_ + 1)
    val dest = viewDir(name).resolve(s"v=$next")
    df.write.mode("overwrite").parquet(dest.toString)
    val tmp = viewDir(name).resolve(s"_CURRENT.tmp.$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** CREATE MATERIALIZED VIEW name AS query — runs the query once and
    * persists version 0. Idempotent re-create overwrites the definition and
    * writes a fresh version. */
  def createMaterializedView(name: String, query: SparkSession => DataFrame): Long = {
    defs.put(name, query)
    commitVersion(name, query(spark))
  }

  /** Read the latest committed snapshot (a plain DataFrame — joins, aggs,
    * further views compose on top exactly like the reference's `Get`). */
  def table(name: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"materialized view not found: $name"))
    tableAt(name, v)
  }

  /** AS OF read: a specific committed version (the timestamp-oracle analog —
    * versions are the view's logical timestamps; history persists until
    * [[vacuum]]). */
  def tableAt(name: String, version: Long): DataFrame = {
    val dir = viewDir(name).resolve(s"v=$version")
    require(Files.exists(dir), s"version $version of $name not found (vacuumed?)")
    spark.read.parquet(dir.toString)
  }

  /** Full refresh: re-run the defining query, commit as a new version. */
  def refreshFull(name: String): Long = {
    val query = defs.getOrElse(name,
      throw new IllegalArgumentException(s"view definition not registered: $name"))
    commitVersion(name, query(spark))
  }

  /** Incremental refresh of an **accumulable-aggregate** view whose rows are
    * `(keyCols..., support: Long, sumCols...)` — the state layout
    * [[graft.streaming.IncrementalReduce.accumulable]] produces. `delta` is a
    * changelog `(keyCols..., valueCols..., diff)`; its diff-weighted partial
    * aggregate merges into the stored state. Keys whose support drops to ≤ 0
    * vanish (Threshold). Derived columns (avg etc.) must be computed by
    * readers from the sums — exactly how the reference maintains only the
    * accumulable core and evaluates the "finishing" map on read. */
  def refreshIncrementalAccumulable(
      name: String,
      delta: DataFrame,
      keyCols: Seq[String],
      sumColToValue: Map[String, String]): Long = {
    val d = col(Changelog.DiffCol)
    val partial = delta.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(d).as("support"),
        sumColToValue.map { case (s, v) => sum(col(v) * d).as(s) }.toSeq: _*)
    val merged = table(name).unionByName(partial)
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("support")).as("support"),
        sumColToValue.keys.map(s => sum(col(s)).as(s)).toSeq: _*)
      .filter(col("support") > 0)
    commitVersion(name, merged)
  }

  /** Drop all versions below the current one (the persist GC analog). */
  def vacuum(name: String): Unit = currentVersion(name).foreach { cur =>
    val dir = viewDir(name)
    if (Files.exists(dir)) {
      Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v=") && n.stripPrefix("v=").toLong < cur)
          deleteRecursive(p)
      }
    }
  }

  def dropView(name: String): Unit = {
    defs.remove(name)
    deleteRecursive(viewDir(name))
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
