package graft

/** Scratch probe (deleted before commit). */
class ProbeSpec extends SparkSpec {
  test("probe") {
    assume(sys.env.contains("PROBE"), "probe only")
    import graft.slt.SltRunner
    spark.sql("create or replace temporary view probe_t as select 1 as a, 'x' as b")
    val r = SltRunner.runFiles(spark, Seq())  // no-op to touch object
    try {
      val df = spark.sql("SELECT probe_t FROM probe_t")
      info("direct OK " + df.collect().mkString)
    } catch { case e: Throwable =>
      info("direct ERR: " + e.getMessage.takeWhile(_ != '\n'))
    }
  }
}
