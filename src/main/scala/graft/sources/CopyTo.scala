package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `COPY TO` one-shot export — the reference's `CopyToS3Oneshot` compute
  * sink (`src/compute-types/src/sinks.rs:41-50`,
  * `src/storage-types/src/oneshot_sources.rs` for the reverse direction):
  * dump a query result to files in a chosen format. Spark-first this is
  * just the DataFrame writer — distributed, one file per partition, the
  * same code path writes to S3/ABFS/GCS URIs on a real cluster.
  */
object CopyTo {

  def parquet(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  def csv(df: DataFrame, dir: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(dir)

  def jsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** `COPY FROM` — the one-shot ingest direction. */
  def fromCsv(spark: SparkSession, dir: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(dir)
}
