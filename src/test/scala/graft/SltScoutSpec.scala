package graft

import java.nio.file.{Files, Paths}

import graft.slt.SltRunner

/** Targeted scout over a few SLT files (env `SLT_SCOUT=f1,f2`) — the fast
  * triage loop for converting skips; the full gate stays SltCorpusSpec.
  * Uses runFiles so per-file table state is dropped exactly like the gate.
  */
class SltScoutSpec extends SparkSpec {
  private val corpus = "/root/reference/test/sqllogictest"

  test("scout listed files") {
    val list = sys.env.getOrElse("SLT_SCOUT", "")
    assume(list.nonEmpty, "SLT_SCOUT not set")
    val paths = list.split(",").map(f => s"$corpus/${f.trim}")
      .filter(p => Files.exists(Paths.get(p))).toSeq
    val reports = SltRunner.runFiles(spark, paths)
    reports.foreach { r =>
      info(f"${r.file}%-24s pass=${r.passed}%4d fail=${r.failed}%3d skip=${r.skipped}%4d")
      r.failures.take(10).foreach(f => info(s"  FAIL: ${f.take(1500)}"))
    }
    SltRunner.censusTop(40).foreach { case (reason, n, sample) =>
      info(f"$n%5d  $reason${if (sample.nonEmpty) s"  e.g. $sample" else ""}")
    }
    assert(reports.map(_.failed).sum == 0)
  }
}
