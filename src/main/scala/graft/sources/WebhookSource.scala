package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions
import graft.streaming.Changelog

/** Webhook push source analog (reference `src/adapter/src/webhook.rs`):
  * producers PUSH requests — a body plus headers — at the engine, which
  * validates each request (an HMAC check over the body against a secret,
  * the reference's `CHECK ... WITH SECRET`), rejects invalid or unparseable
  * ones without poisoning the collection, and appends accepted bodies
  * monotonically.
  *
  * Transport here is directory-drop (the container has no HTTP listener):
  * each line of a dropped JSON file is one request
  * `{"headers": {...}, "body": "<json string>"}` — the batched-push shape.
  * Everything after transport is the reference pipeline: validate → parse →
  * dedup by `x-idempotency-key` → append-only changelog.
  *
  * Scale: validation and parsing are per-row expressions (the HMAC is a
  * codegen'd Catalyst expression, no UDFs); dedup shuffles once on the
  * idempotency key. Nothing touches the driver.
  */
object WebhookSource {

  val SignatureHeader = "x-signature"
  val IdempotencyHeader = "x-idempotency-key"

  /** Wire schema of one request line. */
  val RequestSchema: StructType = StructType(Seq(
    StructField("headers", MapType(StringType, StringType)),
    StructField("body", StringType)))

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private val CorruptCol = "__corrupt"

  /** Per-request validation verdict columns: `__key`, `__ok`, `__why`.
    * Malformed JSON detection: `from_json` in PERMISSIVE mode yields an
    * all-null struct (never a null struct), so the schema is extended with a
    * corrupt-record column — non-null there means the body didn't parse. */
  private def validate(raw: DataFrame, bodySchema: StructType, secret: String): DataFrame = {
    GraftFunctions.register(raw.sparkSession)
    val sigOk = lower(col("headers").getItem(SignatureHeader)) ===
      expr(s"hmac_sha256(${sqlLit(secret)}, body)")
    val extSchema = bodySchema.add(StructField(CorruptCol, StringType))
    val parsed = from_json(col("body"), extSchema,
      Map("columnNameOfCorruptRecord" -> CorruptCol))
    raw
      .withColumn("__key", col("headers").getItem(IdempotencyHeader))
      .withColumn("__parsed", parsed)
      .withColumn("__why",
        when(col("__key").isNull, "missing idempotency key")
          .when(!coalesce(sigOk, lit(false)), "validation failed") // ref: 401, no detail
          .when(col("__parsed").isNull
            || col("__parsed").getField(CorruptCol).isNotNull, "invalid JSON body"))
      .withColumn("__ok", col("__why").isNull)
  }

  /** Batch ingest of a drop directory: returns the accepted changelog
    * (parsed body columns + diff) and the rejected requests with reasons.
    * Duplicate idempotency keys keep one request, chosen deterministically
    * (min body digest) — retried pushes carry identical bodies, so the
    * choice is observable only for a client bug. */
  def ingest(spark: SparkSession, dropDir: String, bodySchema: StructType,
      secret: String): (DataFrame, DataFrame) = {
    val v = validate(spark.read.schema(RequestSchema).json(dropDir), bodySchema, secret)
    val rejected = v.filter(!col("__ok"))
      .select(col("headers"), col("body"), col("__why").as("reason"))
    val winner = Window.partitionBy(col("__key")).orderBy(md5(col("body")))
    val accepted = v.filter(col("__ok"))
      .withColumn("__rn", row_number().over(winner))
      .filter(col("__rn") === 1)
      .select(col("__parsed.*")).drop(CorruptCol)
    (Changelog.fromRows(accepted), rejected)
  }

  /** Streaming ingest: same validate → parse pipeline over a streaming
    * `(headers, body)` frame; idempotency dedup holds per-key state across
    * micro-batches (and restarts, via the checkpoint) in
    * flatMapGroupsWithState — first arrival wins, matching the push
    * endpoint's append order. Rejected rows are dropped (the reference
    * returns them to the pusher as HTTP errors; a one-sink streaming query
    * has nowhere to put them). */
  def ingestStream(raw: DataFrame, bodySchema: StructType, secret: String): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val v = validate(raw, bodySchema, secret)
    val firstSeen = v.filter(col("__ok"))
      .select(col("__key"), col("body"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1).map { case (_, body) => (key, body) }
          }
      }
      .toDF("__key", "body")
    Changelog.fromRows(
      firstSeen.select(from_json(col("body"), bodySchema).as("__parsed"))
        .select(col("__parsed.*")))
  }
}
