package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent-style schema-registry envelope (reference
  * `src/interchange/src/confluent.rs`: `extract_confluent_header` — magic
  * byte `0x00`, then a 4-byte big-endian schema id, then the codec payload).
  *
  * The registry itself is file-backed rather than an HTTP service (the
  * container has no network): a TSV of `id <TAB> format <TAB> DDL schema`
  * rows stands in for the subject/version store, which is exactly the part
  * of the protocol a batch engine needs — resolving a wire schema id to the
  * writer schema the payload was encoded with. Decode then projects the
  * writer record onto the caller's READER schema by field name, which is the
  * single compatibility rule the envelope relies on: new writer fields are
  * invisible to old readers, fields the writer lacks read as null.
  *
  * Unknown ids and malformed frames follow the engine's error-as-data
  * convention (null payload + tagged error column) instead of failing the
  * query — a poison message on a real topic must not kill the dataflow.
  */
object Confluent {
  val Magic: Byte = 0x00
  val HeaderLen: Int = 5

  def wrap(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(HeaderLen + payload.length)
    out.put(Magic).putInt(schemaId).put(payload)
    out.array()
  }

  final case class Entry(format: String, schema: StructType) {
    require(format == "avro" || format == "protobuf",
      s"registry format must be avro|protobuf, got $format")
  }

  /** Immutable id→writer-schema map; serializable so expressions can carry
    * it to executors (the analog of the reference's cached registry client). */
  final class Registry(val entries: Map[Int, Entry]) extends Serializable

  def registryFromFile(path: String): Registry = {
    val lines = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    new Registry(lines.map { l =>
      l.split("\t", 3) match {
        case Array(id, fmt, ddl) => id.toInt -> Entry(fmt, StructType.fromDDL(ddl))
        case _ => throw new IllegalArgumentException(s"bad registry line: $l")
      }
    }.toMap)
  }

  def writeRegistryFile(path: String, rows: Seq[(Int, String, String)]): Unit =
    Files.write(Paths.get(path),
      rows.map { case (id, fmt, ddl) => s"$id\t$fmt\t$ddl" }
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  /** Decode one framed message → (reader-projected row | null, error | null).
    * Called from generated code. */
  def decode(bytes: Array[Byte], registry: Registry, reader: StructType): InternalRow = {
    def err(msg: String): InternalRow =
      InternalRow(null, UTF8String.fromString(msg))
    if (bytes.length < HeaderLen) return err(s"frame too short: ${bytes.length} bytes")
    if (bytes(0) != Magic) return err(f"bad magic byte 0x${bytes(0)}%02x")
    val id = ByteBuffer.wrap(bytes, 1, 4).getInt
    registry.entries.get(id) match {
      case None => InternalRow(null, UTF8String.fromString(s"unknown schema id $id"))
      case Some(Entry(format, writer)) =>
        val payload = java.util.Arrays.copyOfRange(bytes, HeaderLen, bytes.length)
        try {
          val row = format match {
            case "avro" => AvroBinary.decode(payload, writer)
            case _ => ProtobufBinary.decode(payload, writer)
          }
          // writer→reader resolution: match by name; absent fields → null.
          // A same-named field with a different type is a registry/reader
          // contract violation — error-as-data, not a silent null.
          val byName = writer.fieldNames.zipWithIndex.toMap
          val values = new Array[Any](reader.length)
          var i = 0
          while (i < reader.length) {
            val f = reader(i)
            byName.get(f.name) match {
              case Some(j) =>
                if (writer(j).dataType != f.dataType)
                  return err(s"schema id $id: field ${f.name} is ${writer(j).dataType.simpleString}, reader wants ${f.dataType.simpleString}")
                values(i) = row.get(j, writer(j).dataType)
              case None => values(i) = null
            }
            i += 1
          }
          InternalRow(InternalRow.fromSeq(values.toIndexedSeq), null)
        } catch {
          case e: IllegalArgumentException => err(s"schema id $id: ${e.getMessage}")
        }
    }
  }
}

/** `confluent_wrap(id, payload)` — frame codec bytes with the registry
  * envelope. Codegen'd; the id is a per-row expression so one query can mix
  * writer schemas, like a real topic does. */
case class ConfluentWrapExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "confluent_wrap"

  override protected def nullSafeEval(id: Any, payload: Any): Any =
    Confluent.wrap(id.asInstanceOf[Int], payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, p) =>
      s"graft.sources.Confluent.wrap($id, (byte[]) $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ConfluentWrapExpr =
    copy(left = l, right = r)
}

/** `registry_decode(bytes, 'reader ddl')` — resolve the frame's schema id in
  * the registry, decode with the writer schema, project onto the reader
  * schema. Output is `struct(r: reader, err: string)`. */
case class RegistryDecodeExpr(child: Expression, registry: Confluent.Registry, reader: StructType)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("r", reader, nullable = true),
    StructField("err", StringType, nullable = true)))
  override def prettyName: String = "registry_decode"

  override protected def nullSafeEval(input: Any): Any =
    Confluent.decode(input.asInstanceOf[Array[Byte]], registry, reader)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val regRef = ctx.addReferenceObj("confluentRegistry", registry,
      classOf[Confluent.Registry].getName)
    val readerRef = ctx.addReferenceObj("readerSchema", reader, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.Confluent.decode((byte[]) $c, $regRef, $readerRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): RegistryDecodeExpr =
    copy(child = newChild)
}

object ConfluentFunctions {
  /** Registers `confluent_wrap` and, bound to the given registry,
    * `registry_decode` (the registry is resolved once at registration — the
    * analog of the reference caching registry lookups per source). */
  def register(spark: SparkSession, registry: Confluent.Registry): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("confluent_wrap"),
      new ExpressionInfo(classOf[ConfluentWrapExpr].getName, "confluent_wrap"),
      (args: Seq[Expression]) => ConfluentWrapExpr(args.head, args(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("registry_decode"),
      new ExpressionInfo(classOf[RegistryDecodeExpr].getName, "registry_decode"),
      (args: Seq[Expression]) => {
        val ddl = args(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"registry_decode reader schema must be a string literal, got $other")
        }
        RegistryDecodeExpr(args.head, registry, StructType.fromDDL(ddl))
      })
  }
}
