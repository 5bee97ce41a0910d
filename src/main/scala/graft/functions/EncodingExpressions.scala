package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg `encode(bytea, format) -> text` and `decode(text, format) -> bytea`
  * for the three pg binary-text formats: `hex`, `base64` (RFC 2045 / MIME,
  * 76-char line wrap on encode, whitespace-tolerant on decode), and
  * `escape` (octal `\NNN` escapes). Semantics and error text mirror the
  * reference (`src/expr/src/scalar/func/encoding.rs:36-217`,
  * `src/repr/src/strconv.rs:736-792`); pg docs: functions-binarystring.
  *
  * Pure row-level scalar work — the implementation lives in a plain object
  * so interpreted eval stays allocation-light; `CodegenFallback` is fine
  * here (the corpus exercises these at human scale, never in a 100-TB hot
  * path; if one ever lands in a pipeline, the byte-level loops are already
  * branch-predictable).
  */
object PgEncodingImpl {
  private val B64: Array[Char] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/".toCharArray

  /** Rust `char::escape_default` rendering for the base64 invalid-symbol
    * error (reference EvalError::InvalidBase64Symbol). */
  private def escapeDefault(c: Char): String = c match {
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\\' => "\\\\"
    case '\'' => "\\'"
    case '"' => "\\\""
    case p if p >= 0x20 && p <= 0x7e => p.toString
    case o => "\\u{" + Integer.toHexString(o.toInt) + "}"
  }

  def encode(bytes: Array[Byte], format: String): String = format.toLowerCase match {
    case "hex" =>
      val sb = new java.lang.StringBuilder(bytes.length * 2)
      bytes.foreach { b =>
        sb.append(Character.forDigit((b >> 4) & 0xf, 16))
        sb.append(Character.forDigit(b & 0xf, 16))
      }
      sb.toString
    case "base64" =>
      // RFC 2045: line break after every 76 output characters
      val sb = new java.lang.StringBuilder(bytes.length * 4 / 3 + 4)
      var i = 0
      var lineLen = 0
      def put(c: Char): Unit = {
        sb.append(c); lineLen += 1
        if (lineLen == 76) { sb.append('\n'); lineLen = 0 }
      }
      while (i < bytes.length) {
        val rem = bytes.length - i
        val o1 = bytes(i) & 0xff
        val o2 = if (rem > 1) bytes(i + 1) & 0xff else 0
        val o3 = if (rem > 2) bytes(i + 2) & 0xff else 0
        put(B64(o1 >> 2))
        put(B64(((o1 & 0x03) << 4) | (o2 >> 4)))
        if (rem > 1) put(B64(((o2 & 0x0f) << 2) | (o3 >> 6))) else put('=')
        if (rem > 2) put(B64(o3 & 0x3f)) else put('=')
        i += 3
      }
      sb.toString
    case "escape" =>
      // NUL and high bytes as \NNN octal; backslash doubled; the rest
      // verbatim (reference encoding.rs EscapeFormat::encode)
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach { b =>
        val u = b & 0xff
        if (u == 0 || u >= 0x80) {
          sb.append('\\')
          sb.append(('0' + ((u >> 6) & 7)).toChar)
          sb.append(('0' + ((u >> 3) & 7)).toChar)
          sb.append(('0' + (u & 7)).toChar)
        } else if (u == '\\') sb.append("\\\\")
        else sb.append(u.toChar)
      }
      sb.toString
    case other =>
      throw new IllegalArgumentException(s"invalid encoding name '$other'")
  }

  private def decodeSextet(c: Char): Int = c match {
    case x if x >= 'A' && x <= 'Z' => x - 'A'
    case x if x >= 'a' && x <= 'z' => x - 'a' + 26
    case x if x >= '0' && x <= '9' => x - '0' + 52
    case '+' => 62
    case '/' => 63
    case other => throw new IllegalArgumentException(
      s"""invalid symbol "${escapeDefault(other)}" found while decoding base64 sequence""")
  }

  def decode(s: String, format: String): Array[Byte] = format.toLowerCase match {
    case "hex" =>
      // whitespace allowed between encoded bytes, not between the two
      // digits of one byte (strconv.rs parse_bytes_hex)
      val out = new java.io.ByteArrayOutputStream(s.length / 2)
      var i = 0
      def nibble(c: Char): Int = {
        val d = Character.digit(c, 16)
        if (d < 0) throw new IllegalArgumentException(
          s"""invalid hexadecimal digit: "$c"""")
        d
      }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\n' || c == '\t' || c == '\r') i += 1
        else {
          val hi = nibble(c)
          if (i + 1 >= s.length) throw new IllegalArgumentException(
            "invalid hexadecimal data: odd number of digits")
          val lo = nibble(s.charAt(i + 1))
          out.write((hi << 4) | lo)
          i += 2
        }
      }
      out.toByteArray
    case "base64" =>
      // chunks of four after whitespace filtering; '=' only in the final
      // one or two positions of the final chunk (encoding.rs Base64Format)
      val filtered = s.filterNot(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
      val out = new java.io.ByteArrayOutputStream(filtered.length * 3 / 4)
      var i = 0
      while (i < filtered.length) {
        if (filtered.length - i < 4) {
          // a '=' inside an incomplete final chunk is reported as the
          // symbol error, not the truncation error (encoding.rs Base64)
          if (filtered.substring(i).contains('='))
            throw new IllegalArgumentException(
              "unexpected \"=\" while decoding base64 sequence")
          throw new IllegalArgumentException("invalid base64 end sequence")
        }
        val c1 = filtered.charAt(i); val c2 = filtered.charAt(i + 1)
        val c3 = filtered.charAt(i + 2); val c4 = filtered.charAt(i + 3)
        if (c3 == '=' && c4 == '=') {
          if (c1 == '=' || c2 == '=')
            throw new IllegalArgumentException(
              "unexpected \"=\" while decoding base64 sequence")
          val s1 = decodeSextet(c1); val s2 = decodeSextet(c2)
          out.write((s1 << 2) | ((s2 & 0x30) >> 4))
        } else if (c4 == '=') {
          if (c1 == '=' || c2 == '=')
            throw new IllegalArgumentException(
              "unexpected \"=\" while decoding base64 sequence")
          val s1 = decodeSextet(c1); val s2 = decodeSextet(c2)
          val s3 = decodeSextet(c3)
          out.write((s1 << 2) | ((s2 & 0x30) >> 4))
          out.write(((s2 & 0x0f) << 4) | ((s3 & 0x3c) >> 2))
        } else if (c1 == '=' || c2 == '=' || c3 == '=') {
          throw new IllegalArgumentException(
            "unexpected \"=\" while decoding base64 sequence")
        } else {
          val s1 = decodeSextet(c1); val s2 = decodeSextet(c2)
          val s3 = decodeSextet(c3); val s4 = decodeSextet(c4)
          out.write((s1 << 2) | ((s2 & 0x30) >> 4))
          out.write(((s2 & 0x0f) << 4) | ((s3 & 0x3c) >> 2))
          out.write(((s3 & 0x03) << 6) | s4)
        }
        i += 4
        // a non-final chunk ending in '=' means '=' appeared mid-sequence
        if (i < filtered.length && (c3 == '=' || c4 == '='))
          throw new IllegalArgumentException(
            "unexpected \"=\" while decoding base64 sequence")
      }
      out.toByteArray
    case "escape" =>
      // literal bytes; "\\" -> backslash; \NNN (N octal, first digit 0-3)
      // -> that byte (strconv.rs parse_bytes_traditional)
      val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new java.io.ByteArrayOutputStream(bs.length)
      var i = 0
      def err(details: String): Nothing = throw new IllegalArgumentException(
        s"""invalid input syntax for type bytea: "$s": $details""")
      while (i < bs.length) {
        val b = bs(i)
        if (b != '\\') { out.write(b); i += 1 }
        else if (i + 1 >= bs.length) err("ends with escape character")
        else if (bs(i + 1) == '\\') { out.write('\\'); i += 2 }
        else if (i + 3 < bs.length &&
            bs(i + 1) >= '0' && bs(i + 1) <= '3' &&
            bs(i + 2) >= '0' && bs(i + 2) <= '7' &&
            bs(i + 3) >= '0' && bs(i + 3) <= '7') {
          out.write(((bs(i + 1) - '0') << 6) | ((bs(i + 2) - '0') << 3) |
            (bs(i + 3) - '0'))
          i += 4
        } else err("invalid escape sequence")
      }
      out.toByteArray
    case other =>
      throw new IllegalArgumentException(s"invalid encoding name '$other'")
  }

  /** pg bytea input conversion (strconv.rs parse_bytes): a leading `\x`
    * selects the hex input form, anything else parses as the traditional
    * escape format. */
  def parseBytes(s: String): Array[Byte] =
    if (s.startsWith("\\x")) {
      try decode(s.substring(2), "hex")
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type bytea: "$s": ${e.getMessage}""") }
    } else decode(s, "escape")
}

/** Catalyst registration for the pg binary-text codec pair, SQL names
  * `pg_encode` / `pg_decode` (the SLT shim maps the corpus' bare
  * `encode(`/`decode(` calls here; Spark's own `encode(str, charset)` is a
  * different function that must stay reachable). */
object PgEncodingFunctions {

  case class PgEncode(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def foldable: Boolean = children.forall(_.foldable)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val data = children(0).eval(input)
      val fmt = children(1).eval(input)
      if (data == null || fmt == null) return null
      UTF8String.fromString(
        PgEncodingImpl.encode(PgCryptoFunctions.toBytes(data), fmt.toString))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class PgDecode(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def foldable: Boolean = children.forall(_.foldable)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val data = children(0).eval(input)
      val fmt = children(1).eval(input)
      if (data == null || fmt == null) return null
      PgEncodingImpl.decode(data.toString, fmt.toString)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** `pg_bytea_in(text) -> bytea` — pg's bytea input conversion, used by
    * the SLT shim to canonicalize text literals landing in bytea columns on
    * INSERT (pg decodes on ingest; Spark's string->binary cast would store
    * the literal's UTF-8 text). Binary input passes through unchanged. */
  case class PgByteaIn(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def foldable: Boolean = children.forall(_.foldable)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = children(0).eval(input) match {
      case null => null
      case b: Array[Byte] => b
      case other => PgEncodingImpl.parseBytes(other.toString)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_bytea_in"),
      new ExpressionInfo(classOf[PgByteaIn].getName, "pg_bytea_in"),
      (args: Seq[Expression]) => PgByteaIn(args)),
    (new FunctionIdentifier("pg_encode"),
      new ExpressionInfo(classOf[PgEncode].getName, "pg_encode"),
      (args: Seq[Expression]) =>
        if (args.length == 2) PgEncode(args)
        else throw new IllegalArgumentException(
          s"encode expects (data, format), got ${args.length}")),
    (new FunctionIdentifier("pg_decode"),
      new ExpressionInfo(classOf[PgDecode].getName, "pg_decode"),
      (args: Seq[Expression]) =>
        if (args.length == 2) PgDecode(args)
        else throw new IllegalArgumentException(
          s"decode expects (string, format), got ${args.length}")))
}
