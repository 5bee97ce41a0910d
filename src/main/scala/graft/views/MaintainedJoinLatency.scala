package graft.views

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.Changelog

/** Dev tool: per-batch latency of the n-ary maintained join as state grows —
  * `runMain graft.views.MaintainedJoinLatency [stateRows] [deltaRows] [batches]`.
  *
  * Evidence target (round-2 verdict "delta-join planning" item): constant
  * delta size against a growing state must give flat-ish batch latency —
  * the delta terms are delta-sized regardless of |state| thanks to the
  * shared arrangements; the state-proportional floor that remains is the
  * versioned-persist COMMIT write (full-collection rewrite per version; the
  * reference's compacting persist appends instead — measured numbers live
  * in ARCHITECTURE.md).
  */
object MaintainedJoinLatency {
  def main(args: Array[String]): Unit = {
    val stateRows = args.headOption.map(_.toInt).getOrElse(200000)
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(2000)
    val batches = args.lift(2).map(_.toInt).getOrElse(6)
    val spark: SparkSession =
      GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")

    def mk(n: Int, offset: Int) = spark.range(offset, offset + n.toLong)
      .select(col("id").as("okey"), (col("id") % 1000).as("ckey"),
        (col("id") % 97).as("v"))

    val cat = new ViewCatalog(spark, Files.createTempDirectory("graft-mjl").toString)
    val mj = new MaintainedJoinN(cat, "lat", 3, Seq(Seq("okey"), Seq("ckey")))
    mj.initialize(Seq(
      mk(stateRows, 0).select(col("okey"), col("v").as("a")),
      mk(stateRows, 0).select(col("okey"), col("ckey")),
      mk(1000, 0).select(col("ckey").as("__k")).distinct()
        .select(col("__k").as("ckey"), (col("__k") % 7).as("c"))))

    (0 until batches).foreach { b =>
      val off = stateRows + b * deltaRows
      val d0 = Changelog.fromRows(mk(deltaRows, off).select(col("okey"), col("v").as("a")))
      val d1 = Changelog.fromRows(mk(deltaRows, off).select(col("okey"), col("ckey")))
      val d2 = Changelog.fromRows(mk(0, 0).select(col("ckey"), lit(0L).as("c")))
      val t0 = System.nanoTime()
      mj.applyBatch(Seq(d0, d1, d2), batchId = b.toLong)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"batch=$b state=${stateRows + b * deltaRows}%d applyBatch=${sec}%.2fs")
    }
    println(s"final output rows: ${mj.output.count()}")
    spark.stop()
  }
}
