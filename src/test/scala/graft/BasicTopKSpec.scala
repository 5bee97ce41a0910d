package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{BasicTopK, Changelog}

/** Streaming execution of the retraction-capable TopK plan (reference
  * TopKPlan::Basic, render/top_k.rs): state must remember values BELOW the
  * current top k so retractions promote runners-up. */
class BasicTopKSpec extends SparkSpec {
  import spark.implicits._

  private def net(rows: Seq[(String, Double, Long)]): Map[(String, Double), Long] =
    rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      .filter(_._2 != 0L).toMap

  test("retraction of the current #1 promotes the runner-up") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val out = BasicTopK.topKChangelogStream(input.toDS(), 2)
    val q = out.writeStream.format("memory").queryName("btk1")
      .outputMode("append").start()
    try {
      input.addData(("k", 10.0, 1L), ("k", 20.0, 1L), ("k", 30.0, 1L))
      q.processAllAvailable()
      val batch1 = spark.table("btk1").as[(String, Double, Long)].collect().toSeq
      assert(net(batch1) == Map(("k", 30.0) -> 1L, ("k", 20.0) -> 1L))

      // retract the #1: 10.0 (below the old top-2) must surface
      input.addData(("k", 30.0, -1L))
      q.processAllAvailable()
      val all = spark.table("btk1").as[(String, Double, Long)].collect().toSeq
      val batch2 = all.diff(batch1)
      assert(batch2.toSet == Set(("k", 30.0, -1L), ("k", 10.0, 1L)),
        s"expected exact promote changelog, got $batch2")
      assert(net(all) == Map(("k", 20.0) -> 1L, ("k", 10.0) -> 1L))
    } finally q.stop()
  }

  test("duplicate values consume top-k slots with multiplicity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val out = BasicTopK.topKChangelogStream(input.toDS(), 2)
    val q = out.writeStream.format("memory").queryName("btk2")
      .outputMode("append").start()
    try {
      input.addData(("k", 5.0, 2L), ("k", 3.0, 1L))
      q.processAllAvailable()
      val s1 = spark.table("btk2").as[(String, Double, Long)].collect().toSeq
      assert(net(s1) == Map(("k", 5.0) -> 2L)) // both slots taken by 5.0

      input.addData(("k", 5.0, -1L)) // one copy retracted → 3.0 enters
      q.processAllAvailable()
      val s2 = spark.table("btk2").as[(String, Double, Long)].collect().toSeq
      assert(net(s2) == Map(("k", 5.0) -> 1L, ("k", 3.0) -> 1L))
    } finally q.stop()
  }

  test("streaming maintenance converges to the batch form") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val deltas = Seq(
      Seq(("a", 1.0, 1L), ("a", 7.0, 1L), ("b", 4.0, 1L)),
      Seq(("a", 9.0, 1L), ("a", 7.0, -1L), ("b", 2.0, 1L), ("b", 6.0, 1L)),
      Seq(("a", 9.0, -1L), ("b", 4.0, -1L), ("a", 5.0, 2L)))

    val input = MemoryStream[(String, Double, Long)]
    val out = BasicTopK.topKChangelogStream(input.toDS(), 2)
    val q = out.writeStream.format("memory").queryName("btk3")
      .outputMode("append").start()
    try {
      deltas.foreach { d => input.addData(d: _*); q.processAllAvailable() }
      val streamed = net(spark.table("btk3").as[(String, Double, Long)].collect().toSeq)

      val changelog = deltas.flatten.toDF("key", "value", Changelog.DiffCol)
      val batch = BasicTopK.maintainBatch(changelog, Seq("key"),
        Seq(col("value").desc), k = 2)
      val batchNet = batch.collect()
        .groupBy(r => (r.getString(0), r.getDouble(1))).view.mapValues(_.length.toLong).toMap
      assert(streamed == batchNet)
    } finally q.stop()
  }

  test("retracting a never-inserted row fails loudly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val out = BasicTopK.topKChangelogStream(input.toDS(), 2)
    val q = out.writeStream.format("memory").queryName("btk4")
      .outputMode("append").start()
    try {
      input.addData(("k", 1.0, -1L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("negative") ||
        Option(e.getCause).exists(_.getMessage.contains("negative")))
    } finally q.stop()
  }
}
