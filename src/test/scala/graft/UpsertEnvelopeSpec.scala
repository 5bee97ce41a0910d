package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.UpsertEnvelope

class UpsertEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert emits insert/retract changelog across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Option[String], Long)]
    val query = UpsertEnvelope.toChangelog(input.toDS())
      .writeStream.format("memory").queryName("upsert_out").outputMode("append").start()
    try {
      input.addData(("a", Some("v1"), 0L), ("b", Some("v1"), 1L))
      query.processAllAvailable()
      input.addData(("a", Some("v2"), 2L))
      query.processAllAvailable()
      input.addData(("b", None, 3L)) // tombstone
      query.processAllAvailable()
      val rows = spark.table("upsert_out").as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("a", "v1", 1L), ("b", "v1", 1L),
        ("a", "v1", -1L), ("a", "v2", 1L),
        ("b", "v1", -1L)))
    } finally query.stop()
  }

  test("batch upsert applies per-key updates in OFFSET order, not input order") {
    // Deliberately shuffled input order: offsets define the winner.
    val input = Seq(
      ("k1", Option("y"), 5L), ("k1", Option("x"), 1L),
      ("k2", Option.empty[String], 9L), ("k2", Option("z"), 2L))
      .toDS()
    val out = UpsertEnvelope.toChangelog(input).collect().toSet
    assert(out == Set(
      ("k1", "x", 1L), ("k1", "x", -1L), ("k1", "y", 1L),
      ("k2", "z", 1L), ("k2", "z", -1L)))
  }

  test("re-sending an identical value is a no-op (consolidated)") {
    val input = Seq(("k", Option("v"), 1L), ("k", Option("v"), 2L)).toDS()
    assert(UpsertEnvelope.toChangelog(input).collect().toSeq == Seq(("k", "v", 1L)))
  }

  test("stale offsets in later batches are skipped (offset watermark)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Option[String], Long)]
    val query = UpsertEnvelope.toChangelog(input.toDS())
      .writeStream.format("memory").queryName("upsert_stale").outputMode("append").start()
    try {
      input.addData(("a", Some("new"), 10L), ("b", None, 7L))
      query.processAllAvailable()
      // replayed/out-of-order deliveries: earlier offsets must not clobber
      // newer state, and a stale insert must not resurrect a tombstoned key
      input.addData(("a", Some("old"), 3L), ("b", Some("ghost"), 5L))
      query.processAllAvailable()
      val rows = spark.table("upsert_stale").as[(String, String, Long)].collect().toSet
      assert(rows == Set(("a", "new", 1L)))
    } finally query.stop()
  }
}
