package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{AvroBinary, AvroFunctions}

/** Golden byte vectors hand-derived from the Avro 1.11 spec ("Binary
  * encoding") — these pin the WIRE FORMAT, so a symmetric encode/decode bug
  * cannot hide behind a passing round-trip. */
class AvroBinarySpec extends SparkSpec {
  import spark.implicits._

  private def row(vs: Any*): InternalRow = InternalRow.fromSeq(vs.toIndexedSeq)

  test("zigzag matches the spec table") {
    assert(Seq(0L, -1L, 1L, -2L, 2L, -64L, 64L).map(AvroBinary.zigzag) ==
      Seq(0L, 1L, 2L, 3L, 4L, 127L, 128L))
    Seq(0L, 1L, -1L, 63L, -64L, 64L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(AvroBinary.unzigzag(AvroBinary.zigzag(v)) == v)
    }
  }

  test("golden bytes: record of non-null long + string") {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false)))
    val bytes = AvroBinary.encode(row(1L, UTF8String.fromString("foo")), schema)
    assert(bytes.toSeq == Seq[Byte](0x02, 0x06, 0x66, 0x6F, 0x6F))
    // varint spillover: long 64 -> zigzag 128 -> [0x80, 0x01]
    val bytes2 = AvroBinary.encode(row(64L, UTF8String.fromString("")), schema)
    assert(bytes2.toSeq == Seq[Byte](0x80.toByte, 0x01, 0x00))
  }

  test("golden bytes: nullable union, boolean, double") {
    val schema = StructType(Seq(
      StructField("n", LongType, nullable = true),
      StructField("f", BooleanType, nullable = false),
      StructField("d", DoubleType, nullable = false)))
    // null -> union branch 0; true -> 1; 1.0 -> IEEE754 LE
    assert(AvroBinary.encode(row(null, true, 1.0d), schema).toSeq ==
      Seq[Byte](0x00, 0x01, 0, 0, 0, 0, 0, 0, 0xF0.toByte, 0x3F))
    // 5 -> union branch 1 then zigzag(5)=10
    assert(AvroBinary.encode(row(5L, false, 0.0d), schema).take(2).toSeq ==
      Seq[Byte](0x02, 0x0A))
  }

  test("round-trip all supported types incl. negative/extreme values") {
    val schema = StructType(Seq(
      StructField("l", LongType, nullable = true),
      StructField("i", IntegerType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("fl", FloatType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("by", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("dt", DateType, nullable = true)))
    val cases = Seq(
      row(Long.MinValue, Int.MaxValue, false, -0.0d, Float.NaN,
        UTF8String.fromString("héllo ▲"), Array[Byte](0, -1, 127),
        1704067200123456L, 19723),
      row(null, null, null, null, null, null, null, null, null),
      row(-1L, -1, true, Double.MaxValue, -1.5f,
        UTF8String.fromString(""), Array.emptyByteArray, 0L, 0))
    cases.foreach { r =>
      val dec = AvroBinary.decode(AvroBinary.encode(r, schema), schema)
      (0 until schema.length).foreach { i =>
        val (a, b) = (r.get(i, schema(i).dataType), dec.get(i, schema(i).dataType))
        (a, b) match {
          case (x: Array[Byte], y: Array[Byte]) => assert(x.toSeq == y.toSeq)
          case (x: java.lang.Float, y: java.lang.Float) if x.isNaN => assert(y.isNaN)
          case _ => assert(a == b, s"field ${schema(i).name}")
        }
      }
    }
  }

  test("malformed input is a loud error, not silent garbage") {
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val good = AvroBinary.encode(row(UTF8String.fromString("abcd")), schema)
    intercept[IllegalArgumentException] { // truncated body
      AvroBinary.decode(good.dropRight(1), schema)
    }
    intercept[IllegalArgumentException] { // trailing junk
      AvroBinary.decode(good :+ 0x00.toByte, schema)
    }
    intercept[IllegalArgumentException] { // bad union branch
      AvroBinary.decode(Array[Byte](0x04),
        StructType(Seq(StructField("n", LongType, nullable = true))))
    }
  }

  test("SQL surface: avro_encode/avro_decode round-trip under codegen") {
    AvroFunctions.register(spark)
    val df = Seq((1L, "x", Some(2.5d)), (2L, "y", None))
      .toDF("id", "name", "score")
    // the reader schema must MATCH the writer schema, nullability included:
    // Scala Long makes `id` non-nullable, hence NOT NULL in the reader DDL
    // (a mismatch is a loud decode error, not silent drift)
    val out = df.select(expr(
      "avro_decode(avro_encode(struct(id, name, score)), 'id BIGINT NOT NULL, name STRING, score DOUBLE')")
      .as("r")).select("r.*")
    assert(out.as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "x", Some(2.5d)), (2L, "y", None)))
  }

  test("writer schema JSON mirrors the struct") {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(AvroBinary.schemaJson(schema) ==
      """{"type":"record","name":"row","fields":[{"name":"a","type":"long"},{"name":"b","type":["null","string"]}]}""")
  }
}
