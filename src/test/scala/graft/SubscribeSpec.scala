package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{IncrementalReduce, Subscribe}

class SubscribeSpec extends SparkSpec {
  import spark.implicits._

  test("SUBSCRIBE tails an updating aggregate as exact insert/retract batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)] // (key, value, diff)

    val view = IncrementalReduce.accumulableChangelogStream(input.toDS())
      .toDF("key", "support", "total", "diff")
    val sink = new ConcurrentLinkedQueue[Row]()
    val query = Subscribe.startCollecting(view, "subscribe_out", sink)

    def drain(): Seq[(Long, Long, String, Long, Double)] = {
      query.processAllAvailable()
      val out = Iterator.continually(sink.poll()).takeWhile(_ != null)
        .map(r => (r.getLong(r.fieldIndex(Subscribe.TsCol)),
          r.getLong(r.fieldIndex(Subscribe.DiffCol)),
          r.getString(r.fieldIndex("key")),
          r.getLong(r.fieldIndex("support")),
          r.getDouble(r.fieldIndex("total"))))
        .toSeq
      out.sortBy(x => (x._1, x._2, x._3)) // batch order is the contract; sort within batch
    }

    // Batch 0: two inserts for a, one for b.
    input.addData(("a", 10.0, 1L), ("a", 5.0, 1L), ("b", 7.0, 1L))
    assert(drain() == Seq(
      (0L, 1L, "a", 2L, 15.0), (0L, 1L, "b", 1L, 7.0)))

    // Batch 1: update a (retract 5, insert 20) → retraction of the old
    // aggregate row precedes the new one, exactly the reference's subscribe
    // output shape (mz_diff -1 then +1 at one timestamp).
    input.addData(("a", 5.0, -1L), ("a", 20.0, 1L))
    assert(drain() == Seq(
      (1L, -1L, "a", 2L, 15.0), (1L, 1L, "a", 2L, 30.0)))

    // Batch 2: delete b entirely → only a retraction, no insertion.
    input.addData(("b", 7.0, -1L))
    assert(drain() == Seq((2L, -1L, "b", 1L, 7.0)))

    // Batch 3: net no-op for a → consolidated to nothing.
    input.addData(("a", 3.0, 1L), ("a", 3.0, -1L))
    assert(drain() == Seq.empty)

    query.stop()
  }
}
