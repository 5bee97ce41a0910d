package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.HierarchicalMinMax

class MonotonicMinMaxSpec extends SparkSpec {
  import spark.implicits._

  test("monotonic min/max maintains extrema with O(1) state on append-only input") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val query = HierarchicalMinMax.monotonicMinMaxStream(input.toDS())
      .toDF("key", "min", "max", "diff")
      .writeStream.format("memory").queryName("mono_minmax_out").outputMode("append").start()
    try {
      input.addData(("k", 5.0, 1L), ("k", 1.0, 1L))
      query.processAllAvailable()
      input.addData(("k", 9.0, 1L)) // extends max → retract (1,5), insert (1,9)
      query.processAllAvailable()
      input.addData(("k", 3.0, 1L)) // interior insert → no emission
      query.processAllAvailable()
      val all = spark.table("mono_minmax_out").as[(String, Double, Double, Long)].collect().toSeq
      assert(all == Seq(
        ("k", 1.0, 5.0, 1L),
        ("k", 1.0, 5.0, -1L), ("k", 1.0, 9.0, 1L)))
    } finally query.stop()
  }

  test("monotonic plan rejects retractions loudly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val query = HierarchicalMinMax.monotonicMinMaxStream(input.toDS())
      .toDF("key", "min", "max", "diff")
      .writeStream.format("memory").queryName("mono_minmax_err").outputMode("append").start()
    try {
      input.addData(("k", 5.0, -1L))
      val e = intercept[Exception](query.processAllAvailable())
      assert(e.toString.contains("retraction") ||
        Option(e.getCause).exists(_.toString.contains("retraction")) ||
        e.getMessage.contains("Terminated"))
    } finally query.stop()
  }
}
