package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.UpsertEnvelope

/** File-based CDC ingestion: Debezium-JSON envelope decode → upsert envelope
  * → insert/retract changelog (reference
  * `src/storage-types/src/sources/envelope.rs:24-35` for the envelope kinds,
  * `src/interchange/src/json.rs` for the decode). The container has no
  * Kafka, so the transport is a file (batch) or file-stream (Structured
  * Streaming `readStream.format("json")`) — the decode and envelope
  * machinery is transport-agnostic: the same columns arrive from
  * `spark.readStream.format("kafka")`'s `value` in production.
  *
  * Envelope shape (Debezium default, schemas stripped):
  * `{"op": "c"|"r"|"u"|"d", "ts_ms": ..., "before": {...}|null,
  *   "after": {...}|null}` — op `d` carries the deleted row in `before` and
  * null `after`; everything else upserts `after`.
  *
  * Scale: decode is `from_json` (codegen'd, no UDF); the upsert fold is
  * keyed state partitioned by key — reference's RocksDB-backed upsert
  * (`src/storage/src/upsert.rs`) maps to Spark's state store.
  */
object DebeziumJson {

  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("before", rowSchema),
    StructField("after", rowSchema)))

  /** Decode raw envelope JSON (`value` string column + `offset` long column)
    * into `(op, before, after, offset)` typed columns. */
  def decode(raw: DataFrame, rowSchema: StructType): DataFrame =
    raw.select(
      from_json(col("value"), envelopeSchema(rowSchema)).as("env"),
      col("offset"))
      .select(col("env.op").as("op"), col("env.before").as("before"),
        col("env.after").as("after"), col("offset"))

  /** Decoded envelopes → upsert tuples `(key, value?, offset)` where key is
    * the canonical JSON of the key columns and value the canonical JSON of
    * the after-image (`None` = deletion). Canonical JSON (fixed field order
    * from the schema) keeps keys stable across batches. */
  def toUpsertTuples(decoded: DataFrame, keyCols: Seq[String]): Dataset[(String, Option[String], Long)] = {
    import decoded.sparkSession.implicits._
    decoded
      .select(
        to_json(struct(keyCols.map(k =>
          coalesce(col(s"after.$k"), col(s"before.$k")).as(k)): _*)).as("k"),
        when(col("op") === "d", lit(null: String))
          .otherwise(to_json(col("after"))).as("v"),
        col("offset"))
      .as[(String, Option[String], Long)]
  }

  /** Full pipeline: raw envelope JSON → upsert → `(key, value, diff)`
    * changelog of JSON strings (works identically on batch and streaming
    * inputs). Downstream re-types with `from_json(value, rowSchema)`. */
  def toChangelog(raw: DataFrame, rowSchema: StructType, keyCols: Seq[String]): Dataset[(String, String, Long)] = {
    import raw.sparkSession.implicits._
    UpsertEnvelope.toChangelog(toUpsertTuples(decode(raw, rowSchema), keyCols))
  }
}
