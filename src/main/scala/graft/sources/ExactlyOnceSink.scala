package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once file sink — the transactional-sink pattern of the
  * reference's Kafka sink (`src/storage/src/sink/kafka.rs`: transactional
  * writes + a progress topic recording the last committed batch).
  *
  * Spark-first: `foreachBatch` gives at-least-once batch delivery with a
  * stable `batchId`; exactly-once follows from IDEMPOTENT commits — each
  * batch writes to a staging dir, then atomically renames to
  * `<dir>/batch=<id>`. A replayed batch (restart/retry) finds its committed
  * dir and skips. The batch-dir presence IS the progress record; readers
  * (`spark.read.parquet(dir)`) see only complete, committed batches.
  */
object ExactlyOnceSink {

  /** Idempotent commit of one batch; returns true if this call wrote it,
    * false if the batch was already committed (replay). */
  def writeBatch(batch: DataFrame, dir: String, batchId: Long): Boolean = {
    val target = Paths.get(dir, s"batch=$batchId")
    if (Files.exists(target)) false
    else {
      val staging = Paths.get(dir, s".staging-$batchId")
      batch.write.mode("overwrite").parquet(staging.toString)
      Files.createDirectories(target.getParent)
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
      true
    }
  }

  /** Attach the sink to a streaming DataFrame. */
  def start(df: DataFrame, dir: String, name: String): StreamingQuery =
    df.writeStream
      .queryName(name)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        writeBatch(b.toDF(), dir, id); ()
      }
      .start()
}
