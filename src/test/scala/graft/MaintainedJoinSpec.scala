package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.Changelog
import graft.views.{MaintainedJoin, ViewCatalog}

class MaintainedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("maintained join view advances by delta batches and matches full recompute") {
    val cat = new ViewCatalog(spark, Files.createTempDirectory("graft-mj").toString)
    val mj = new MaintainedJoin(cat, "oc", Seq("k"))

    val a0 = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "av")
    val b0 = Seq((1, "b1"), (2, "b2")).toDF("k", "bv")
    mj.initialize(a0, b0)
    assert(mj.output.select("k", "av", "bv").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSet ==
      Set((1, "a1", "b1"), (2, "a2", "b2")))

    // batch 1: retract a2, insert b3 (k=3) — join gains (3,a3,b3), loses (2,..)
    mj.applyBatch(
      Changelog.negate(Changelog.fromRows(Seq((2, "a2")).toDF("k", "av"))),
      Changelog.fromRows(Seq((3, "b3")).toDF("k", "bv")))
    assert(mj.output.select("k", "av", "bv").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSet ==
      Set((1, "a1", "b1"), (3, "a3", "b3")))

    // batch 2: double-insert a1 (multiplicity 2) and retract b1 entirely
    mj.applyBatch(
      Changelog.fromRows(Seq((1, "a1")).toDF("k", "av")),
      Changelog.negate(Changelog.fromRows(Seq((1, "b1")).toDF("k", "bv"))))
    val out = mj.output.select(col("k"), col("av"), col("bv"), col(Changelog.DiffCol)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out == Set((3, "a3", "b3", 1L)))

    // history preserved: three committed output versions
    assert(mj.outputVersion.contains(2L))
  }

  test("streaming drive: tagged changelog stream advances the maintained join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = new ViewCatalog(spark, Files.createTempDirectory("graft-mjs").toString)
    val mj = new MaintainedJoin(cat, "ocs", Seq("k"))
    mj.initialize(
      Seq((1, "a1"), (2, "a2")).toDF("k", "av"),
      Seq((1, "b1")).toDF("k", "bv"))

    // tagged union schema: (__src, k, av, bv, diff)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, String, String, Long)]
    val query = mj.attachStream(
      input.toDS().toDF("__src", "k", "av", "bv", Changelog.DiffCol),
      "mj_stream", Seq("k", "av", Changelog.DiffCol), Seq("k", "bv", Changelog.DiffCol))
    try {
      // one micro-batch: insert b2 (k=2), retract a1
      input.addData(("b", 2, null, "b2", 1L), ("a", 1, "a1", null, -1L))
      query.processAllAvailable()
      val out = mj.output.select(col("k"), col("av"), col("bv")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      assert(out == Set((2, "a2", "b2")))
    } finally query.stop()
  }
}
