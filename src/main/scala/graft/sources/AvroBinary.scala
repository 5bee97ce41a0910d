package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal pure-JVM Avro BINARY codec — the single-writer-schema case of the
  * reference's Avro interchange (reference `src/interchange/src/avro.rs:1-184`
  * decode/encode; wire format per the Avro 1.11 spec "Binary encoding"):
  *
  *  - int/long: zigzag varint          - float/double: little-endian IEEE
  *  - boolean: one byte 0/1            - string/bytes: varint length + bytes
  *  - nullable field: union ["null",T] — varint branch index 0 (null) / 1
  *  - record: field encodings concatenated in schema order
  *  - date: int days (logical `date`); timestamp: long micros
  *    (logical `timestamp-micros`) — Spark's internal representations
  *    coincide, so no conversion beyond the varint
  *
  * No registry protocol, no schema resolution, no containers — those need
  * dependencies the build intentionally freezes; this closes the common
  * "decode a known-schema Kafka value" path. The mapping from a Spark
  * StructType to the Avro schema is positional and total: every supported
  * Spark type has exactly one Avro encoding, so a StructType IS the writer
  * schema.
  */
object AvroBinary {

  // ---- primitives ----------------------------------------------------------

  def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  def unzigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Mutable cursor over an encoded buffer. */
  final class Reader(val buf: Array[Byte]) {
    var pos: Int = 0
    def readVarint(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0
      do {
        if (pos >= buf.length)
          throw new IllegalArgumentException("truncated Avro varint")
        b = buf(pos) & 0xFF
        pos += 1
        acc |= (b & 0x7FL) << shift
        shift += 7
        if (shift > 70) throw new IllegalArgumentException("malformed Avro varint")
      } while ((b & 0x80) != 0)
      acc
    }
    def readLong(): Long = unzigzag(readVarint())
    def readBytes(n: Int): Array[Byte] = {
      if (pos + n > buf.length)
        throw new IllegalArgumentException(s"truncated Avro buffer: need $n at $pos")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
  }

  // ---- record codec --------------------------------------------------------

  private def encodeValue(out: ByteArrayOutputStream, dt: DataType, row: InternalRow, i: Int): Unit =
    dt match {
      case LongType | TimestampType | TimestampNTZType => writeVarint(out, zigzag(row.getLong(i)))
      case IntegerType | DateType => writeVarint(out, zigzag(row.getInt(i).toLong))
      case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
      case DoubleType =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        b.putDouble(row.getDouble(i))
        out.write(b.array(), 0, 8)
      case FloatType =>
        val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        b.putFloat(row.getFloat(i))
        out.write(b.array(), 0, 4)
      case StringType =>
        val bytes = row.getUTF8String(i).getBytes
        writeVarint(out, zigzag(bytes.length.toLong))
        out.write(bytes, 0, bytes.length)
      case BinaryType =>
        val bytes = row.getBinary(i)
        writeVarint(out, zigzag(bytes.length.toLong))
        out.write(bytes, 0, bytes.length)
      case other =>
        throw new UnsupportedOperationException(s"AvroBinary: unsupported type $other")
    }

  /** Encode one record. Called from generated code. */
  def encode(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (f.nullable) {
        // union ["null", T]
        if (row.isNullAt(i)) writeVarint(out, zigzag(0L))
        else { writeVarint(out, zigzag(1L)); encodeValue(out, f.dataType, row, i) }
      } else {
        if (row.isNullAt(i))
          throw new IllegalArgumentException(s"null in non-nullable Avro field ${f.name}")
        encodeValue(out, f.dataType, row, i)
      }
      i += 1
    }
    out.toByteArray
  }

  private def decodeValue(r: Reader, dt: DataType): Any = dt match {
    case LongType | TimestampType | TimestampNTZType => r.readLong()
    case IntegerType | DateType => r.readLong().toInt
    case BooleanType => r.readBytes(1)(0) != 0
    case DoubleType =>
      ByteBuffer.wrap(r.readBytes(8)).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case FloatType =>
      ByteBuffer.wrap(r.readBytes(4)).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case StringType => UTF8String.fromBytes(r.readBytes(r.readLong().toInt))
    case BinaryType => r.readBytes(r.readLong().toInt)
    case other =>
      throw new UnsupportedOperationException(s"AvroBinary: unsupported type $other")
  }

  /** Decode one record. Called from generated code. */
  def decode(bytes: Array[Byte], schema: StructType): InternalRow = {
    val r = new Reader(bytes)
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (f.nullable) {
        r.readLong() match {
          case 0L => values(i) = null
          case 1L => values(i) = decodeValue(r, f.dataType)
          case b => throw new IllegalArgumentException(s"bad union branch $b in ${f.name}")
        }
      } else values(i) = decodeValue(r, f.dataType)
      i += 1
    }
    if (r.pos != bytes.length)
      throw new IllegalArgumentException(
        s"trailing ${bytes.length - r.pos} bytes after Avro record")
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  /** The Avro writer-schema JSON a StructType maps to — for interop
    * documentation and specs; the codec itself walks the StructType. */
  def schemaJson(schema: StructType, name: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case IntegerType => "\"int\""
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case BooleanType => "\"boolean\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw new UnsupportedOperationException(other.toString)
    }
    schema.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(s"""{"type":"record","name":"$name","fields":[""", ",", "]}")
  }
}

/** `avro_encode(struct)` — encode a struct as a single Avro binary record;
  * the struct's type is the writer schema. Codegen'd (a static call). */
case class AvroEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"
  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.encode(input.asInstanceOf[InternalRow], structType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("avroSchema", structType, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.AvroBinary.encode((org.apache.spark.sql.catalyst.InternalRow) $c, $schemaRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpr =
    copy(child = newChild)
}

/** `avro_decode(binary, 'a BIGINT, b STRING')` — decode a single Avro binary
  * record against the DDL-described writer schema. */
case class AvroDecodeExpr(child: Expression, schema: StructType) extends UnaryExpression {
  override def dataType: DataType = schema
  override def prettyName: String = "avro_decode"

  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.decode(input.asInstanceOf[Array[Byte]], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("avroSchema", schema, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.AvroBinary.decode((byte[]) $c, $schemaRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpr =
    copy(child = newChild)
}

/** SQL-name registration (same pattern as [[graft.functions.GraftFunctions]]). */
object AvroFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("avro_encode"),
      new ExpressionInfo(classOf[AvroEncodeExpr].getName, "avro_encode"),
      (args: Seq[Expression]) => AvroEncodeExpr(args.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("avro_decode"),
      new ExpressionInfo(classOf[AvroDecodeExpr].getName, "avro_decode"),
      (args: Seq[Expression]) => {
        val ddl = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
            s.toString
          case other =>
            throw new IllegalArgumentException(
              s"avro_decode schema must be a string literal, got $other")
        }
        AvroDecodeExpr(args.head, StructType.fromDDL(ddl))
      })
  }
}
