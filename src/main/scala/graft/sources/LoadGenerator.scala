package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Load-generator source (reference
  * `src/storage-types/src/sources/load_generator.rs` — Auction/Counter
  * generators): every column is a pure md5-derived function of a monotone
  * row id, so the SAME projection serves batch (`spark.range`) and
  * streaming (`rate` source) and a DuckDB oracle can recompute rows
  * bit-for-bit. No state, no UDFs — the generator scales with executors.
  */
object LoadGenerator {

  val Items = Seq("book", "car", "gem", "art", "toy", "wine", "coin", "map")

  private def h60(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** Derive auction columns from an `id` column. */
  def auctionColumns(ids: DataFrame): DataFrame =
    ids.select(
      col("id"),
      (expr(h60("concat('slr', id)")) % 1000).as("seller"),
      ((expr(h60("concat('amt', id)")) % 100000) / 100.0).as("amount"),
      element_at(
        array(Items.map(lit): _*),
        (expr(h60("concat('itm', id)")) % 8).cast("int") + 1).as("item"),
      (lit(1704067200L) + (col("id") * 7919) % 604800).as("bid_s"))

  /** Bounded batch generator. */
  def auctionsBatch(spark: SparkSession, n: Long): DataFrame =
    auctionColumns(spark.range(n).toDF("id"))

  /** Unbounded streaming generator at `rowsPerSecond`. */
  def auctionsStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    auctionColumns(
      spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond)
        .load().select(col("value").as("id")))
}
