package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.MonotonicTopK

class MonotonicTopKSpec extends SparkSpec {
  import spark.implicits._

  test("monotonic top-k emits insert/evict changelog with O(k) state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val query = MonotonicTopK.topKChangelogStream(input.toDS(), k = 2)
      .toDF("key", "v", "diff")
      .writeStream.format("memory").queryName("topk_out").outputMode("append").start()
    try {
      input.addData(("k", 5.0, 1L), ("k", 1.0, 1L))
      query.processAllAvailable()
      // 9 enters, 1 evicted
      input.addData(("k", 9.0, 1L))
      query.processAllAvailable()
      // 3 is below the current top-2 {9,5} → no change
      input.addData(("k", 3.0, 1L))
      query.processAllAvailable()
      val all = spark.table("topk_out").as[(String, Double, Long)].collect().toSeq
      assert(all == Seq(
        ("k", 5.0, 1L), ("k", 1.0, 1L),
        ("k", 1.0, -1L), ("k", 9.0, 1L)))
    } finally query.stop()
  }
}
