package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal pure-JVM Protobuf (proto3) binary codec — the known-schema case
  * of the reference's Protobuf interchange (reference
  * `src/interchange/src/protobuf.rs:1-240`; wire format per the Protocol
  * Buffers encoding spec):
  *
  *  - field tag: varint `(field_number << 3) | wire_type`; field number is
  *    the struct position + 1
  *  - wire 0 (varint): int32/int64/bool — negatives as 64-bit two's
  *    complement (10-byte varint), per proto3 `int64`
  *  - wire 1 / 5: little-endian double / float
  *  - wire 2: length-delimited string/bytes
  *  - timestamp / timestamp_ntz → int64 micros; date → int32 days
  *
  * proto3 semantics are kept faithfully: DEFAULT values (0, "", false,
  * empty bytes) are omitted on encode and materialized on decode — a NULL
  * input column is therefore coerced to its proto3 default (proto3 scalars
  * have no null). Unknown field numbers are SKIPPED by wire type on decode
  * (the forward-compatibility guarantee), malformed tags/truncations raise.
  * No descriptor pools or nested messages — those need prost-style
  * reflection the build's frozen dependencies cannot provide; this closes
  * the flat-message Kafka-value path.
  */
object ProtobufBinary {

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class Reader(val buf: Array[Byte]) {
    var pos: Int = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0
      do {
        if (pos >= buf.length)
          throw new IllegalArgumentException("truncated protobuf varint")
        b = buf(pos) & 0xFF
        pos += 1
        acc |= (b & 0x7FL) << shift
        shift += 7
        if (shift > 70) throw new IllegalArgumentException("malformed protobuf varint")
      } while ((b & 0x80) != 0)
      acc
    }
    def readBytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length)
        throw new IllegalArgumentException(s"truncated protobuf buffer: need $n at $pos")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
  }

  private def wireType(dt: DataType): Int = dt match {
    case LongType | IntegerType | BooleanType | TimestampType | TimestampNTZType |
         DateType => 0
    case DoubleType => 1
    case FloatType => 5
    case StringType | BinaryType => 2
    case other =>
      throw new UnsupportedOperationException(s"ProtobufBinary: unsupported type $other")
  }

  /** Encode one message. proto3: default-valued and null fields are omitted. */
  def encode(row: InternalRow, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      val dt = schema(i).dataType
      if (!row.isNullAt(i)) {
        val tag = ((i + 1).toLong << 3) | wireType(dt)
        dt match {
          case LongType | TimestampType | TimestampNTZType =>
            val v = row.getLong(i)
            if (v != 0L) { writeVarint(out, tag); writeVarint(out, v) }
          case IntegerType | DateType =>
            val v = row.getInt(i)
            if (v != 0) { writeVarint(out, tag); writeVarint(out, v.toLong) }
          case BooleanType =>
            if (row.getBoolean(i)) { writeVarint(out, tag); out.write(1) }
          case DoubleType =>
            val v = row.getDouble(i)
            if (v != 0.0d || java.lang.Double.doubleToRawLongBits(v) != 0L) {
              writeVarint(out, tag)
              val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
              b.putDouble(v)
              out.write(b.array(), 0, 8)
            }
          case FloatType =>
            val v = row.getFloat(i)
            if (v != 0.0f || java.lang.Float.floatToRawIntBits(v) != 0) {
              writeVarint(out, tag)
              val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
              b.putFloat(v)
              out.write(b.array(), 0, 4)
            }
          case StringType =>
            val bytes = row.getUTF8String(i).getBytes
            if (bytes.nonEmpty) {
              writeVarint(out, tag)
              writeVarint(out, bytes.length.toLong)
              out.write(bytes, 0, bytes.length)
            }
          case BinaryType =>
            val bytes = row.getBinary(i)
            if (bytes.nonEmpty) {
              writeVarint(out, tag)
              writeVarint(out, bytes.length.toLong)
              out.write(bytes, 0, bytes.length)
            }
          case other =>
            throw new UnsupportedOperationException(s"ProtobufBinary: $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode one message; missing fields become proto3 defaults. */
  def decode(bytes: Array[Byte], schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) { // proto3 defaults
      values(i) = schema(i).dataType match {
        case LongType | TimestampType | TimestampNTZType => 0L
        case IntegerType | DateType => 0
        case BooleanType => false
        case DoubleType => 0.0d
        case FloatType => 0.0f
        case StringType => UTF8String.EMPTY_UTF8
        case BinaryType => Array.emptyByteArray
        case other =>
          throw new UnsupportedOperationException(s"ProtobufBinary: $other")
      }
      i += 1
    }
    val r = new Reader(bytes)
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      val idx = field - 1
      if (idx >= 0 && idx < schema.length && wireType(schema(idx).dataType) == wire) {
        schema(idx).dataType match {
          case LongType | TimestampType | TimestampNTZType => values(idx) = r.readVarint()
          case IntegerType | DateType => values(idx) = r.readVarint().toInt
          case BooleanType => values(idx) = r.readVarint() != 0L
          case DoubleType => values(idx) =
            ByteBuffer.wrap(r.readBytes(8)).order(ByteOrder.LITTLE_ENDIAN).getDouble
          case FloatType => values(idx) =
            ByteBuffer.wrap(r.readBytes(4)).order(ByteOrder.LITTLE_ENDIAN).getFloat
          case StringType => values(idx) = UTF8String.fromBytes(r.readBytes(r.readVarint().toInt))
          case BinaryType => values(idx) = r.readBytes(r.readVarint().toInt)
          case _ => ()
        }
      } else wire match { // unknown field: skip by wire type
        case 0 => r.readVarint(); ()
        case 1 => r.readBytes(8); ()
        case 2 => r.readBytes(r.readVarint().toInt); ()
        case 5 => r.readBytes(4); ()
        case w => throw new IllegalArgumentException(s"bad protobuf wire type $w")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
}

/** `protobuf_encode(struct)` — encode a struct as one proto3 message; field
  * numbers are struct positions + 1. Codegen'd (a static call). */
case class ProtobufEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "protobuf_encode"
  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override protected def nullSafeEval(input: Any): Any =
    ProtobufBinary.encode(input.asInstanceOf[InternalRow], structType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("pbSchema", structType, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.ProtobufBinary.encode((org.apache.spark.sql.catalyst.InternalRow) $c, $schemaRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProtobufEncodeExpr =
    copy(child = newChild)
}

/** `protobuf_decode(binary, 'a BIGINT, b STRING')` — decode one proto3
  * message against the DDL message schema (fields at positions 1..N). */
case class ProtobufDecodeExpr(child: Expression, schema: StructType) extends UnaryExpression {
  override def dataType: DataType = schema
  override def prettyName: String = "protobuf_decode"

  override protected def nullSafeEval(input: Any): Any =
    ProtobufBinary.decode(input.asInstanceOf[Array[Byte]], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("pbSchema", schema, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.ProtobufBinary.decode((byte[]) $c, $schemaRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProtobufDecodeExpr =
    copy(child = newChild)
}

/** SQL-name registration (same pattern as [[AvroFunctions]]). */
object ProtobufFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("protobuf_encode"),
      new ExpressionInfo(classOf[ProtobufEncodeExpr].getName, "protobuf_encode"),
      (args: Seq[Expression]) => ProtobufEncodeExpr(args.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("protobuf_decode"),
      new ExpressionInfo(classOf[ProtobufDecodeExpr].getName, "protobuf_decode"),
      (args: Seq[Expression]) => {
        val ddl = args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"protobuf_decode schema must be a string literal, got $other")
        }
        ProtobufDecodeExpr(args.head, StructType.fromDDL(ddl))
      })
  }
}
