package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ProtobufBinary, ProtobufFunctions}

/** Golden byte vectors from the Protocol Buffers encoding documentation —
  * they pin the wire format so a symmetric codec bug cannot hide behind a
  * passing round-trip. */
class ProtobufBinarySpec extends SparkSpec {
  import spark.implicits._

  private def row(vs: Any*): InternalRow = InternalRow.fromSeq(vs.toIndexedSeq)

  test("golden bytes: the canonical field1=150 example, strings, tags") {
    // protobuf docs: message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    val s1 = StructType(Seq(StructField("a", IntegerType)))
    assert(ProtobufBinary.encode(row(150), s1).toSeq ==
      Seq[Byte](0x08, 0x96.toByte, 0x01))
    // message Test2 { string b = 2; } with b="testing" -> 12 07 74..67
    val s2 = StructType(Seq(StructField("pad", LongType), StructField("b", StringType)))
    assert(ProtobufBinary.encode(row(0L, UTF8String.fromString("testing")), s2).toSeq ==
      Seq[Byte](0x12, 0x07, 0x74, 0x65, 0x73, 0x74, 0x69, 0x6E, 0x67))
    // negative int64: two's-complement 10-byte varint
    val s3 = StructType(Seq(StructField("n", LongType)))
    assert(ProtobufBinary.encode(row(-2L), s3).toSeq ==
      Seq[Byte](0x08, 0xFE.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x01))
  }

  test("proto3 defaults: omitted on encode, materialized on decode") {
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("s", StringType),
      StructField("f", BooleanType), StructField("d", DoubleType)))
    // all defaults -> empty message
    assert(ProtobufBinary.encode(row(0L, UTF8String.EMPTY_UTF8, false, 0.0d), schema).isEmpty)
    // nulls coerce to defaults (proto3 scalars have no null)
    assert(ProtobufBinary.encode(row(null, null, null, null), schema).isEmpty)
    val dec = ProtobufBinary.decode(Array.emptyByteArray, schema)
    assert(dec.getLong(0) == 0L && dec.getUTF8String(1).toString == "" &&
      !dec.getBoolean(2) && dec.getDouble(3) == 0.0d)
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    val writer = StructType(Seq(
      StructField("a", LongType), StructField("x", StringType),
      StructField("d", DoubleType)))
    val reader = StructType(Seq(StructField("a", LongType))) // fields 2,3 unknown
    val bytes = ProtobufBinary.encode(
      row(7L, UTF8String.fromString("ignored"), 2.5d), writer)
    val dec = ProtobufBinary.decode(bytes, reader)
    assert(dec.getLong(0) == 7L)
  }

  test("round-trip all supported types, malformed input raises") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("b", BooleanType), StructField("d", DoubleType),
      StructField("fl", FloatType), StructField("s", StringType),
      StructField("by", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val r = row(Long.MinValue, -7, true, -2.5d, 1.5f,
      UTF8String.fromString("héllo"), Array[Byte](1, 2), 1704067200123456L, 19723)
    val dec = ProtobufBinary.decode(ProtobufBinary.encode(r, schema), schema)
    assert(dec.getLong(0) == Long.MinValue && dec.getInt(1) == -7 &&
      dec.getBoolean(2) && dec.getDouble(3) == -2.5d && dec.getFloat(4) == 1.5f &&
      dec.getUTF8String(5).toString == "héllo" && dec.getBinary(6).toSeq == Seq[Byte](1, 2) &&
      dec.getLong(7) == 1704067200123456L && dec.getInt(8) == 19723)

    intercept[IllegalArgumentException] { // truncated length-delimited body
      ProtobufBinary.decode(Array[Byte](0x32, 0x05, 0x61),
        StructType(Seq(StructField("a", LongType))))
    }
  }

  test("parquet-derived types round-trip (TIMESTAMP_NTZ from non-UTC parquet)") {
    // The driver's orders table stores timestamp[ms] WITHOUT UTC adjustment,
    // which Spark reads as TIMESTAMP_NTZ — a type the r3 codec crashed on.
    // Round-trip the driver-realistic schema straight off the real parquet.
    ProtobufFunctions.register(spark)
    val orders = Tables.load(spark, Sf, "orders")
    assert(orders.schema("o_orderdate").dataType == TimestampNTZType,
      "precondition: o_orderdate must arrive as TIMESTAMP_NTZ")
    val out = orders
      .select(expr(
        """protobuf_decode(
          |  protobuf_encode(struct(o_orderkey, o_orderdate, o_orderpriority)),
          |  'o_orderkey BIGINT, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING')""".stripMargin)
        .as("r"))
      .select(col("r.*"))
    val expected = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
    assert(out.count() == orders.count())
  }

  test("SQL surface: protobuf_encode/decode round-trip under codegen") {
    ProtobufFunctions.register(spark)
    val df = Seq((5L, "x", 1.5d), (6L, "", 0.0d)).toDF("id", "name", "score")
    val out = df.select(expr(
      "protobuf_decode(protobuf_encode(struct(id, name, score)), 'id BIGINT, name STRING, score DOUBLE')")
      .as("r")).select("r.*")
    assert(out.as[(Long, String, Double)].collect().toSet ==
      Set((5L, "x", 1.5d), (6L, "", 0.0d)))
  }
}
