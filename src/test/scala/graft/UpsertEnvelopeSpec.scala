package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.UpsertEnvelope

class UpsertEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert emits insert/retract changelog across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Option[String])]
    val query = UpsertEnvelope.toChangelog(input.toDS())
      .writeStream.format("memory").queryName("upsert_out").outputMode("append").start()
    try {
      input.addData(("a", Some("v1")), ("b", Some("v1")))
      query.processAllAvailable()
      input.addData(("a", Some("v2")))
      query.processAllAvailable()
      input.addData(("b", None)) // tombstone
      query.processAllAvailable()
      val rows = spark.table("upsert_out").as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("a", "v1", 1L), ("b", "v1", 1L),
        ("a", "v1", -1L), ("a", "v2", 1L),
        ("b", "v1", -1L)))
    } finally query.stop()
  }

  test("batch upsert collapses to per-key net state") {
    val input = Seq(
      ("k1", Option("x")), ("k1", Option("y")), ("k2", Option("z")), ("k2", Option.empty[String]))
      .toDS()
    val out = UpsertEnvelope.toChangelog(input).collect().toSet
    assert(out == Set(
      ("k1", "x", 1L), ("k1", "x", -1L), ("k1", "y", 1L),
      ("k2", "z", 1L), ("k2", "z", -1L)))
  }
}
