package graft.sources

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.streaming.Changelog

/** Sink-side envelope encoding — the framing half of the interchange layer
  * (reference `src/interchange/src/envelopes.rs`,
  * `src/storage/src/sink/kafka.rs`): a view's commit changelog becomes
  * key/value framed messages a downstream consumer (or this engine's own
  * decoders) can replay.
  *
  *  - **ENVELOPE UPSERT** (FORMAT AVRO): one message per changed key —
  *    `key` is the Confluent-framed Avro encoding of the key columns,
  *    `value` the framed Avro row for an upsert or NULL for a deletion (the
  *    Kafka tombstone convention). Compacted-topic semantics: latest frame
  *    per key wins.
  *  - **ENVELOPE DEBEZIUM** (FORMAT JSON): one message per changed key with
  *    the full change shape `{"op", "ts_ms", "before", "after"}` — exactly
  *    what [[DebeziumJson.decode]] consumes, so the engine round-trips its
  *    own emission through its existing CDC source.
  *
  * All framing is built from codegen'd column expressions (`avro_encode`,
  * `to_json`, binary `concat` with a literal header) — no UDFs, work ∝
  * |delta| rows.
  */
object SinkEnvelopes {

  /** The 5-byte Confluent header for a schema id (magic 0x00 + BE id) as a
    * column-literal prefix — framing becomes a plain binary concat. */
  def header(schemaId: Int): Array[Byte] =
    ByteBuffer.allocate(Confluent.HeaderLen).put(Confluent.Magic).putInt(schemaId).array()

  /** Split a consolidated changelog into upsert-shaped changes:
    * (rows to insert/replace, keys deleted outright). A key retracted AND
    * re-inserted is an update — it appears only in the insert side. */
  def changes(delta: DataFrame, keys: Seq[String]): (DataFrame, DataFrame) = {
    val inserts = delta.filter(col(Changelog.DiffCol) > 0).drop(Changelog.DiffCol)
    val goneKeys = delta.filter(col(Changelog.DiffCol) < 0)
      .select(keys.map(col): _*).distinct()
      .join(inserts.select(keys.map(col): _*), keys, "left_anti")
    (inserts, goneKeys)
  }

  private def avroStruct(cols: Seq[String]): String =
    s"avro_encode(struct(${cols.mkString(", ")}))"

  /** UPSERT envelope frames `(key: binary, value: binary|null)` for one
    * commit's changes. Callers persist the frame batch; the key/value writer
    * schemas live in a registry file under `keyId`/`valueId` so the frames
    * decode through [[Confluent.decode]]/`registry_decode`. */
  def upsertAvroFrames(spark: SparkSession, inserts: DataFrame, goneKeys: DataFrame,
      keys: Seq[String], keyId: Int, valueId: Int): DataFrame = {
    AvroFunctions.register(spark)
    val valueCols = inserts.columns.toSeq
    val upserts = inserts.select(
      concat(lit(header(keyId)), expr(avroStruct(keys))).as("key"),
      concat(lit(header(valueId)), expr(avroStruct(valueCols))).as("value"))
    val tombstones = goneKeys.select(
      concat(lit(header(keyId)), expr(avroStruct(keys))).as("key"),
      lit(null).cast(BinaryType).as("value"))
    upserts.unionByName(tombstones)
  }

  /** DEBEZIUM envelope frames `(key: string, value: string)` for one
    * commit's changes: before/after images joined per key from the commit
    * changelog. `op` is c (create), u (update), d (delete); `ts_ms` is the
    * commit version (the view's logical timestamp). */
  def debeziumJsonFrames(delta: DataFrame, keys: Seq[String], version: Long): DataFrame = {
    val rowCols = delta.columns.filterNot(_ == Changelog.DiffCol).toSeq
    // full outer per key: retract-only = d, insert-only = c, both = u
    val b = delta.filter(col(Changelog.DiffCol) < 0)
      .select(keys.map(col) :+ struct(rowCols.map(col): _*).as("before"): _*)
    val a = delta.filter(col(Changelog.DiffCol) > 0)
      .select(keys.map(col) :+ struct(rowCols.map(col): _*).as("after"): _*)
    val joined = b.join(a, keys, "full_outer")
    joined.select(
      // USING-join key columns are already coalesced across the two sides
      to_json(struct(keys.map(col): _*)).as("key"),
      to_json(struct(
        when(col("after").isNull, lit("d"))
          .when(col("before").isNull, lit("c")).otherwise(lit("u")).as("op"),
        lit(version).as("ts_ms"),
        col("before"), col("after"))).as("value"))
  }
}
