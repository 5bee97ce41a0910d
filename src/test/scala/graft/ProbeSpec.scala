package graft

import graft.slt.SltTestHooks

/** Scratch probe (deleted before commit). */
class ProbeSpec extends SparkSpec {
  test("probe") {
    assume(sys.env.contains("PROBE"), "probe only")
    Seq(
      "(LIST [1, 2, 3][2:3])",
      "x[2:3])",
      "(x[2:3])",
      "x[2:3] y",
      "LIST [1, 2, 3][2:3]"
    ).foreach(s => info("ARR: |" + SltTestHooks.rewriteArrays(s) + "|"))
  }
}
