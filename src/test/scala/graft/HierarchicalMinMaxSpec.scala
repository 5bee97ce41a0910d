package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.HierarchicalMinMax

class HierarchicalMinMaxSpec extends SparkSpec {
  import spark.implicits._

  test("min/max survive retraction of the current extremum (per-key recompute)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val query = HierarchicalMinMax.minMaxChangelogStream(input.toDS())
      .toDF("key", "min", "max", "diff")
      .writeStream.format("memory").queryName("minmax_out").outputMode("append").start()

    try {
      input.addData(("k", 5.0, 1L), ("k", 1.0, 1L), ("k", 9.0, 1L))
      query.processAllAvailable()
      // Retract the current max → extrema must recompute to (1, 5).
      input.addData(("k", 9.0, -1L))
      query.processAllAvailable()
      // Retract the current min → (5, 5).
      input.addData(("k", 1.0, -1L))
      query.processAllAvailable()
      // Non-extremal insert → no emission.
      input.addData(("k", 5.0, 1L)) // duplicate value: multiset count 2, extrema unchanged
      query.processAllAvailable()
      // Delete everything → final retraction only.
      input.addData(("k", 5.0, -1L), ("k", 5.0, -1L))
      query.processAllAvailable()

      val all = spark.table("minmax_out").as[(String, Double, Double, Long)].collect().toSeq
      assert(all == Seq(
        ("k", 1.0, 9.0, 1L),
        ("k", 1.0, 9.0, -1L), ("k", 1.0, 5.0, 1L),
        ("k", 1.0, 5.0, -1L), ("k", 5.0, 5.0, 1L),
        ("k", 5.0, 5.0, -1L)))
    } finally query.stop()
  }
}
