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
  private val groupOf = TrieMap.empty[String, String] // member view -> group
  // one global clock + commit log per catalog: every commit (grouped or not)
  // is stamped in ONE serialization order, so readers can pin a timestamp
  // and see a consistent cut across INDEPENDENT views (the timestamp-oracle
  // analog; groups alone only order their own members)
  private val oracle = new TimestampOracle(baseDir)
  private val timeline = new CommitTimeline(baseDir)
  // views exposed to plain SQL as temp views — re-registered on every commit
  // so `spark.sql("select * from v")` always reads the latest version, even
  // when the refresh came through the Scala API rather than SQL REFRESH
  private val exposed = TrieMap.empty[String, Unit]
  // post-commit hooks (continuous sinks): view -> hookId -> callback run with
  // (delta changelog, new snapshot, committed version) after every pointer
  // flip — the analog of a sink dataflow reading the view's persist
  // CHANGELOG, not re-diffing its snapshots. A hook that throws leaves the
  // view commit durable (the flip already happened); consumers self-heal by
  // resuming from their own recorded position via [[deltaAt]].
  private val commitHooks =
    TrieMap.empty[String, TrieMap[String, (DataFrame, DataFrame, Long) => Unit]]

  // schemas recorded at write time, so read-backs skip parquet
  // schema-inference (each un-schema'd spark.read.parquet launches a footer
  // job — pure driver/job latency in the commit chain). Metadata only; a
  // catalog re-opened over a pre-existing baseDir simply misses and infers.
  private val snapSchemas =
    TrieMap.empty[(String, Long), org.apache.spark.sql.types.StructType]
  private val deltaSchemas =
    TrieMap.empty[(String, Long), org.apache.spark.sql.types.StructType]

  private def readParquet(p: Path,
      schema: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).parquet(p.toString)

  private def viewDir(name: String): Path = Paths.get(baseDir, name)
  private def deltaDir(name: String, v: Long): Path =
    viewDir(name).resolve(s"delta=$v")
  private def currentFile(name: String): Path = viewDir(name).resolve("_CURRENT")
  private def groupDir(group: String): Path = Paths.get(baseDir, s"$group.group")

  private def readPointer(f: Path): Option[Long] =
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
    else None

  /** Latest committed version, if the view has ever been written. A view
    * that belongs to a commit group resolves through the group's manifest
    * (one atomic pointer for the whole group), not a per-view pointer. */
  def currentVersion(name: String): Option[Long] =
    groupOf.get(name) match {
      case Some(g) =>
        currentGroupSeq(g).flatMap(s => groupManifest(g, s)._2.get(name))
      case None => readPointer(currentFile(name))
    }

  // ---- atomic multi-collection commit groups -------------------------------
  //
  // The reference's persist sink advances ONE frontier across every
  // collection a dataflow writes (`src/compute/src/sink/materialized_view.rs`;
  // timestamp oracle `src/timestamp-oracle/src/lib.rs:46`): readers never see
  // collection X at time t with collection Y at t-1, and a crashed write is
  // invisible. The Spark-side analog: all member version dirs are written
  // completely, then ONE manifest file (naming every member's version + the
  // last applied batchId) is flipped atomically. A reader resolves the
  // manifest once, so it observes all-old or all-new, never a torn mix; a
  // crash before the flip leaves only orphan version dirs the replay
  // overwrites.

  /** Current manifest sequence number of a commit group. */
  def currentGroupSeq(group: String): Option[Long] =
    readPointer(groupDir(group).resolve("_CURRENT"))

  /** (lastBatchId, member -> version) recorded at a given group sequence. */
  def groupManifest(group: String, seq: Long): (Long, Map[String, Long]) = {
    val bytes = Files.readAllBytes(groupDir(group).resolve(s"manifest-$seq"))
    var batchId = -1L
    val m = Map.newBuilder[String, Long]
    new String(bytes, StandardCharsets.UTF_8).split("\n").map(_.trim)
      .filter(_.nonEmpty).foreach { line =>
        val Array(k, v) = line.split("=", 2)
        if (k == "__batchId") batchId = v.toLong else m += k -> v.toLong
      }
    (batchId, m.result())
  }

  /** Commit new versions of several views as ONE atomic, idempotent step.
    *
    * `batchId >= 0` marks a replayable streaming batch: if the group's
    * manifest already records `lastBatchId >= batchId`, the call is a no-op
    * returning false — a restarted/replayed `foreachBatch` cannot
    * double-apply. `batchId = -1` always applies (non-batch maintenance).
    *
    * Members not in `dfs` keep their current versions in the new manifest.
    * `deltas` optionally supplies a member's commit changelog (see
    * [[commitState]]); members without one get the generic diff fallback
    * inside [[persistDelta]].
    */
  def commitGroup(group: String, batchId: Long, dfs: Map[String, DataFrame],
      deltas: Map[String, DataFrame => DataFrame] = Map.empty): Boolean = {
    val curSeq = currentGroupSeq(group)
    val (curBatch, curVers) =
      curSeq.map(s => groupManifest(group, s)).getOrElse((-1L, Map.empty[String, Long]))
    if (batchId >= 0 && curBatch >= batchId) return false // replayed batch
    dfs.keys.foreach(n => groupOf.put(n, group))
    val newVers = dfs.map { case (n, df) =>
      val next = curVers.get(n).fold(0L)(_ + 1)
      writeVersion(n, df, next, deltas.get(n))
      n -> next
    }
    val nextSeq = curSeq.fold(0L)(_ + 1)
    val effBatch = if (batchId >= 0) batchId else curBatch
    Files.createDirectories(groupDir(group))
    val content = (s"__batchId=$effBatch" +:
      (curVers ++ newVers).toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" })
      .mkString("\n")
    Files.write(groupDir(group).resolve(s"manifest-$nextSeq"),
      content.getBytes(StandardCharsets.UTF_8))
    val tmp = groupDir(group).resolve(s"_CURRENT.tmp.$nextSeq")
    Files.write(tmp, nextSeq.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, groupDir(group).resolve("_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    timeline.record(oracle.writeTs(), newVers)
    newVers.keys.foreach(syncTempView)
    newVers.foreach { case (n, v) => runCommitHooks(n, v) }
    true
  }

  /** Last replayable batchId the group committed (-1 if none). */
  def lastBatchId(group: String): Long =
    currentGroupSeq(group).map(s => groupManifest(group, s)._1).getOrElse(-1L)

  /** AS OF read of a group member at a group sequence number. Every member
    * read at the same seq is mutually consistent — they come from one
    * manifest (the timestamp-oracle analog: seq is the group's logical
    * timestamp). History persists until [[vacuum]]. */
  def tableAsOf(group: String, name: String, seq: Long): DataFrame = {
    val (_, vers) = groupManifest(group, seq)
    tableAt(name, vers.getOrElse(name,
      throw new IllegalArgumentException(s"$name not in group $group at seq $seq")))
  }

  // ---- delta-structured persist -------------------------------------------
  //
  // The reference's persist stores an MV as an LSM of DELTA batches; full
  // snapshots are derived artifacts produced by background compaction
  // (`src/persist-client/src/lib.rs`). Mirroring that: a commit whose delta
  // the engine already knows (incremental refresh, temporal advance) writes
  // ONLY the `delta=<n>` batch — work and bytes ∝ |delta|, never |view| —
  // and every `compactEvery`-th version also writes a full `v=<n>` snapshot
  // (the compaction event) so merge-on-read chains stay bounded. Reads of a
  // version without its own snapshot reconstruct base ⊎ deltas via the
  // changelog algebra. Full refreshes (already O(|view|)) keep writing
  // snapshots directly.

  /** Delta-only commits tolerated on top of a base snapshot before a commit
    * also compacts to a full snapshot. */
  private val compactEvery: Long =
    spark.conf.get("spark.graft.mv.compactEvery", "4").toLong

  /** Greatest version at or below `v` that has a full snapshot dir. */
  private def baseVersionAtOrBelow(name: String, v: Long): Option[Long] = {
    val dir = viewDir(name)
    if (!Files.exists(dir)) None
    else {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        val bases = s.iterator.asScala.flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("v=")) Some(n.stripPrefix("v=").toLong).filter(_ <= v)
          else None
        }.toSeq
        if (bases.isEmpty) None else Some(bases.max)
      } finally s.close()
    }
  }

  /** Persist version `next` of `name` as a delta batch (plus periodic
    * compaction) whenever a changelog exists for the commit; only version 0
    * and changelog-VALUED collections write full snapshots.
    *
    * Commits that know their changelog (incremental refresh, temporal
    * advance) always took the delta path. Full refreshes used to write the
    * new snapshot AND then diff it against the old one into the stored delta
    * — two sequential write jobs per refresh. The generic diff is itself a
    * complete changelog of the commit, so the full-refresh path now writes
    * ONLY that delta (one job, the persist-LSM shape the reference uses):
    * the snapshot of a delta-structured version is the derived artifact
    * [[tableAt]] reconstructs, and every `compactEvery`-th commit still
    * materializes it so merge-on-read chains stay bounded. */
  private def writeVersion(name: String, df: DataFrame, next: Long,
      known: Option[DataFrame => DataFrame]): Unit = {
    val delta: Option[DataFrame => DataFrame] =
      if (next == 0 || df.columns.contains(Changelog.DiffCol)) None
      else known.orElse(Some { (newSnap: DataFrame) =>
        // generic commit changelog `new ∖ old ∪ -(old ∖ new)`, computed from
        // the not-yet-written plan — acceptable only here, on the
        // full-refresh path, which is already O(|view|)
        Changelog.consolidate(Changelog.unionAll(
          Changelog.fromRows(newSnap),
          Changelog.negate(Changelog.fromRows(tableAt(name, next - 1)))))
      })
    delta match {
      case Some(d) =>
        // `df` IS the new snapshot relation (not yet written) — the delta
        // function receives the plan instead of a read-back
        val dd = d(df)
        dd.write.mode("overwrite").parquet(deltaDir(name, next).toString)
        // asNullable: schema inference over parquet always yields nullable
        // fields, so the recorded schema must match what a read would infer
        deltaSchemas.put((name, next), graft.Schemas.nullable(dd.schema))
        snapSchemas.put((name, next), graft.Schemas.nullable(df.schema))
        val base = baseVersionAtOrBelow(name, next - 1).getOrElse(-1L)
        if (next - base >= compactEvery)
          df.write.mode("overwrite").parquet(viewDir(name).resolve(s"v=$next").toString)
      case None =>
        // version 0 (deltaAt derives its changelog from the snapshot) and
        // changelog-valued collections (their rows ARE the delta algebra;
        // a second diff column would collide) stay snapshot-structured
        df.write.mode("overwrite").parquet(viewDir(name).resolve(s"v=$next").toString)
        snapSchemas.put((name, next), graft.Schemas.nullable(df.schema))
    }
  }

  /** Write `df` as the next version and atomically flip the pointer. */
  private def commitVersion(name: String, df: DataFrame,
      knownDelta: Option[DataFrame => DataFrame] = None): Long = {
    val next = currentVersion(name).fold(0L)(_ + 1)
    writeVersion(name, df, next, knownDelta)
    val tmp = viewDir(name).resolve(s"_CURRENT.tmp.$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    timeline.record(oracle.writeTs(), Map(name -> next))
    syncTempView(name)
    runCommitHooks(name, next)
    next
  }

  /** The stored commit changelog `version-1 → version` — `(row..., diff)`.
    * Version 0 is the snapshot itself at diff +1. Falls back to the snapshot
    * diff for changelog-valued collections and pre-delta history. Delta dirs
    * survive [[vacuum]] (they are the history SUBSCRIBE serves). */
  def deltaAt(name: String, version: Long): DataFrame = {
    val d = deltaDir(name, version)
    if (Files.exists(d)) readParquet(d, deltaSchemas.get((name, version)))
    else if (version == 0L) Changelog.fromRows(tableAt(name, 0L))
    else Changelog.consolidate(Changelog.unionAll(
      Changelog.fromRows(tableAt(name, version)),
      Changelog.negate(Changelog.fromRows(tableAt(name, version - 1)))))
  }

  /** Register a post-commit hook under `hookId` (idempotent re-register
    * replaces). The hook runs synchronously after every pointer flip of
    * `name`, receiving `(delta changelog, new snapshot, version)` — the
    * delta is the STORED commit changelog ([[deltaAt]]), so a sink's work is
    * ∝ |delta| regardless of view size. The flip precedes the hook, so a
    * throwing hook leaves the view commit durable; hook consumers must
    * record their own resume position and catch up from stored deltas. */
  def addCommitHook(name: String, hookId: String,
      f: (DataFrame, DataFrame, Long) => Unit): Unit =
    commitHooks.getOrElseUpdate(name, TrieMap.empty).put(hookId, f)

  def removeCommitHook(name: String, hookId: String): Unit =
    commitHooks.get(name).foreach(_.remove(hookId))

  private def runCommitHooks(name: String, version: Long): Unit =
    commitHooks.get(name).foreach(_.values.foreach(f =>
      f(deltaAt(name, version), tableAt(name, version), version)))

  /** Make the view readable by plain `spark.sql` under its own name. The
    * registration is refreshed inside EVERY commit path, so SQL readers
    * resolve the latest committed version no matter which API refreshed it. */
  def exposeAsTempView(name: String): Unit = {
    exposed.put(name, ())
    syncTempView(name)
  }

  // a view whose SQL name is bound by something other than the raw snapshot
  // (CREATE INDEX binds the bucketed arrangement) installs a binder; every
  // sync path routes through it so a later exposeAsTempView/commit cannot
  // silently re-point the name at the un-arranged snapshot
  private val binders = TrieMap.empty[String, () => Unit]

  def setViewBinder(name: String, f: () => Unit): Unit = {
    binders.put(name, f); ()
  }

  def clearViewBinder(name: String): Unit = {
    binders.remove(name); ()
  }

  private def syncTempView(name: String): Unit =
    if (exposed.contains(name)) binders.get(name) match {
      case Some(bind) => bind()
      case None => table(name).createOrReplaceTempView(name)
    }

  /** CREATE MATERIALIZED VIEW name AS query — runs the query once and
    * persists version 0. Re-creating an existing name (CREATE OR REPLACE)
    * starts a NEW incarnation: the reference drops and re-creates the
    * dataflow, so the old history — possibly of a different schema — is
    * removed rather than extended. Attached commit hooks survive and
    * observe the reseed as a version-0 commit. */
  def createMaterializedView(name: String, query: SparkSession => DataFrame): Long = {
    if (currentVersion(name).isDefined) {
      deleteRecursive(viewDir(name))
      forgetSchemas(name) // new incarnation may change the schema
    }
    defs.put(name, query)
    commitVersion(name, query(spark))
  }

  /** Register the defining query WITHOUT writing a version — the write-only
    * commit path ([[commitGroup]]) stays separate from definition
    * registration, so batch application can never install a definition that
    * captures its own delta (re-running such a definition would double-apply
    * the batch). */
  def registerDefinition(name: String, query: SparkSession => DataFrame): Unit = {
    defs.put(name, query); ()
  }

  /** Is `name` a view this catalog knows (registered or ever committed)? */
  def isDefined(name: String): Boolean =
    defs.contains(name) || currentVersion(name).isDefined

  /** Every view with a registered definition (SHOW MATERIALIZED VIEWS). */
  def viewNames: Seq[String] = defs.keys.toSeq.sorted

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
    if (Files.exists(dir)) readParquet(dir, snapSchemas.get((name, version)))
    else {
      // merge-on-read: a delta-structured version derives its snapshot from
      // the nearest base snapshot plus the stored delta batches above it —
      // one consolidation shuffle over |base| + |chain deltas|, with chain
      // length bounded by `compactEvery`
      val base = baseVersionAtOrBelow(name, version).getOrElse(
        throw new IllegalArgumentException(
          s"version $version of $name not found (vacuumed?)"))
      val chain = ((base + 1) to version).map { v =>
        val d = deltaDir(name, v)
        require(Files.exists(d),
          s"version $version of $name not found (missing delta=$v)")
        readParquet(d, deltaSchemas.get((name, v)))
      }
      val baseChg = Changelog.fromRows(
        readParquet(viewDir(name).resolve(s"v=$base"), snapSchemas.get((name, base))))
      // single all-columns aggregation: the consolidated result is a valid
      // snapshot (net multiplicities ≥ 0 by the commit invariants), so the
      // expansion skips threshold()'s second exchange over the same rows
      Changelog.toRowsOfConsolidated(Changelog.consolidate(
        Changelog.unionAll((baseChg +: chain).toIndexedSeq: _*)))
    }
  }

  /** Full refresh: re-run the defining query, commit as a new version. The
    * query is evaluated against the CURRENT catalog state (definitions must
    * read through [[table]], never capture deltas), so a refresh of a
    * group-member view recomputes from its live inputs and commits through
    * the group manifest. */
  def refreshFull(name: String): Long = {
    val query = defs.getOrElse(name,
      throw new IllegalArgumentException(s"view definition not registered: $name"))
    val df = query(spark)
    groupOf.get(name) match {
      case Some(g) =>
        commitGroup(g, -1L, Map(name -> df))
        currentVersion(name).get
      case None => commitVersion(name, df)
    }
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
    val old = table(name) // pinned pre-flip: still the prior version inside commit
    val merged = old.unionByName(partial)
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("support")).as("support"),
        sumColToValue.keys.map(s => sum(col(s)).as(s)).toSeq: _*)
      .filter(col("support") > 0)
    // the engine KNOWS which state rows changed: exactly the delta's keys.
    // The stored commit changelog is retract(old row) + insert(new row) per
    // changed key — two semi-join-pruned scans whose OUTPUT is ∝ |delta
    // keys|, never the full-snapshot diff (`exceptAll`) the fallback pays.
    val changedKeys = delta.select(keyCols.map(col).toIndexedSeq: _*).distinct()
    commitVersion(name, merged, Some { newSnap =>
      Changelog.consolidate(Changelog.unionAll(
        Changelog.fromRows(newSnap.join(changedKeys, keyCols, "left_semi")),
        Changelog.negate(Changelog.fromRows(old.join(changedKeys, keyCols, "left_semi")))))
    })
  }

  /** Commit `df` as the next version of `name` without re-running the
    * registered definition — the entry point for state-only maintenance
    * paths ([[TemporalView.advance]]: the new state derives from the old
    * state, not from the defining query). `knownDelta`, when the caller
    * already knows the commit's changelog (a temporal advance knows its
    * retraction set exactly), is persisted as-is instead of the generic
    * snapshot diff; it receives the durably-written new snapshot. */
  def commitState(name: String, df: DataFrame,
      knownDelta: Option[DataFrame => DataFrame] = None): Long =
    commitVersion(name, df, knownDelta)

  // ---- linearized reads across independent views ---------------------------

  /** Highest global timestamp a reader may pin: every commit at or below it
    * is durable. Pin ONCE, then read several views through [[tableAtTime]] —
    * the result is a consistent cut across views that share no commit group
    * (the reference's `TimestampOracle::read_ts`,
    * `src/timestamp-oracle/src/lib.rs:46`). */
  def globalReadTs(): Long = oracle.readTs()

  /** Read `name` as of global time `ts`: the snapshot its latest commit at
    * or before `ts` produced, regardless of how many commits it has had
    * since. History persists until [[vacuum]]. */
  def tableAtTime(name: String, ts: Long): DataFrame =
    timeline.versionAt(name, ts) match {
      case Some(v) => tableAt(name, v)
      case None => throw new IllegalArgumentException(
        s"$name had no committed version at global time $ts")
    }

  /** Drop snapshots below the current version (the persist GC analog) —
    * keeping the base snapshot the current version reconstructs from when
    * it is delta-structured. Delta batches survive (they are the history
    * SUBSCRIBE serves). */
  def vacuum(name: String): Unit = currentVersion(name).foreach { cur =>
    val dir = viewDir(name)
    val keep = baseVersionAtOrBelow(name, cur).getOrElse(cur)
    if (Files.exists(dir)) {
      Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v=") && n.stripPrefix("v=").toLong < keep)
          deleteRecursive(p)
      }
    }
  }

  def dropView(name: String): Unit = {
    defs.remove(name)
    exposed.remove(name)
    deleteRecursive(viewDir(name))
    forgetSchemas(name)
  }

  private def forgetSchemas(name: String): Unit = {
    snapSchemas.keys.filter(_._1 == name).foreach(snapSchemas.remove)
    deltaSchemas.keys.filter(_._1 == name).foreach(deltaSchemas.remove)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
