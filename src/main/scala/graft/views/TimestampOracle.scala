package graft.views

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Catalog-wide timestamp authority — the analog of the reference's
  * timestamp oracle (reference `src/timestamp-oracle/src/lib.rs:46`: one
  * authority allocates strictly-increasing write timestamps and tracks the
  * highest timestamp all writes at-or-below which are durable, so reads of
  * INDEPENDENT collections can be linearized against one clock).
  *
  * Commit groups ([[ViewCatalog.commitGroup]]) already make views *within* a
  * group mutually consistent; this closes the remaining gap — two views that
  * share no group still commit in one global serialization order, and a
  * reader that pins `readTs()` once sees a consistent cut across ALL views.
  *
  * Durability is a single `_TSO` file (atomic tmp+rename, like every pointer
  * in the persist layer), so a reopened catalog continues strictly after the
  * timestamps it handed out before the restart. One oracle instance per
  * catalog directory is the authority — the same single-writer assumption
  * the reference enforces by routing allocation through one service.
  */
final class TimestampOracle(baseDir: String) {

  private val file: Path = Paths.get(baseDir, "_TSO")
  private val last = new java.util.concurrent.atomic.AtomicLong(
    if (Files.exists(file))
      new String(Files.readAllBytes(file), StandardCharsets.UTF_8).trim.toLong
    else 0L)

  /** Allocate the next write timestamp — strictly increasing, durable before
    * being handed out (a crash can waste timestamps, never reuse one). */
  def writeTs(): Long = synchronized {
    val ts = last.incrementAndGet()
    val tmp = file.resolveSibling(s"_TSO.tmp.$ts")
    Files.createDirectories(file.getParent)
    Files.write(tmp, ts.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ts
  }

  /** Highest timestamp a reader may pin: every commit at or below it is
    * durable (commits are recorded synchronously at allocation order). */
  def readTs(): Long = last.get()
}

/** Append-only commit timeline: one file per global timestamp naming the
  * view versions committed at that instant. `versionAt` resolves a view to
  * its version as of any pinned timestamp — the linearized multi-view read
  * path (each timeline file is tiny metadata; the data plane is untouched).
  */
final class CommitTimeline(baseDir: String) {

  private def dir: Path = Paths.get(baseDir, "_timeline")

  def record(ts: Long, versions: Map[String, Long]): Unit = {
    Files.createDirectories(dir)
    val content = versions.toSeq.sortBy(_._1)
      .map { case (n, v) => s"$n=$v" }.mkString("\n")
    val tmp = dir.resolve(f"t-$ts%019d.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(f"t-$ts%019d"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** The version `name` had as of global time `ts` (its latest commit at or
    * before `ts`), if it had committed by then. */
  def versionAt(name: String, ts: Long): Option[Long] = {
    if (!Files.isDirectory(dir)) return None
    val files = Files.list(dir).iterator()
    var best: Option[(Long, Long)] = None // (commitTs, version)
    while (files.hasNext) {
      val p = files.next()
      val fn = p.getFileName.toString
      if (fn.startsWith("t-") && !fn.endsWith(".tmp")) {
        val commitTs = fn.stripPrefix("t-").toLong
        if (commitTs <= ts && best.forall(_._1 < commitTs)) {
          new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
            .split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
              val Array(n, v) = line.split("=", 2)
              if (n == name) best = Some((commitTs, v.toLong))
            }
        }
      }
    }
    best.map(_._2)
  }
}
