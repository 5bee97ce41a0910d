package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's MAP type over Spark `MapType` (reference
  * `src/repr/src/adt/map.rs`; strconv parse_map / format_map; corpus
  * test/sqllogictest/map.slt). Keys are always text; the text input form
  * is `{k=>v, ...}` with the same bare/quoted/escape rules as lists plus
  * the `=>` pair separator (escape it to use it in a bare token). LAST
  * duplicate key wins; rendering sorts by key. */
object MzMapExpressions {

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Parse a map value type spelling: a scalar name or `map[text=>T]`. */
  private def valueDataType(spec: String): DataType = {
    val t = spec.trim.toLowerCase
    val Nested = """^map\s*\[\s*(?:text|string|varchar)\s*=>\s*(.+)\]$""".r
    t match {
      case Nested(inner) => MapType(StringType, valueDataType(inner))
      case _ => MzListExpressions.scalarType(t)
    }
  }

  private def convertScalar(s: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(s)
    case IntegerType => try s.trim.toInt catch { case _: Exception =>
      err(s"""invalid input syntax for type integer: "$s"""") }
    case LongType => try s.trim.toLong catch { case _: Exception =>
      err(s"""invalid input syntax for type bigint: "$s"""") }
    case DoubleType => try s.trim.toDouble catch { case _: Exception =>
      err(s"""invalid input syntax for type double precision: "$s"""") }
    case BooleanType => s.trim.toLowerCase match {
      case "t" | "true" | "yes" | "on" | "1" => true
      case "f" | "false" | "no" | "off" | "0" => false
      case o => err(s"""invalid input syntax for type boolean: "$o"""")
    }
    case other => MzListExpressions.converter(other)(s)
  }

  /** Parse mz map text into (sorted keys, values) catalyst arrays. */
  def parseMap(s: String, vt: DataType): MapData = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    // token scan shared by keys and values; keys stop at unescaped `=>`
    def token(isKey: Boolean): (String, Boolean) = { // (text, wasQuoted)
      ws()
      if (i < s.length && s.charAt(i) == '"') {
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= s.length) err("unterminated quoted string")
          val c = s.charAt(i)
          if (c == '\\') {
            if (i + 1 >= s.length) err("unterminated quoted string")
            sb += s.charAt(i + 1); i += 2
          } else if (c == '"') { closed = true; i += 1 }
          else { sb += c; i += 1 }
        }
        (sb.toString, true)
      } else {
        val sb = new StringBuilder
        var lastContent = 0
        var stop = false
        while (!stop) {
          if (i >= s.length) err("unexpected end of input")
          val c = s.charAt(i)
          if (c == ',' || c == '}') stop = true
          else if (isKey && c == '=' && i + 1 < s.length && s.charAt(i + 1) == '>')
            stop = true
          else if (c == '{') err("""expected '}', found '{'""")
          else if (c == '"') err("""must escape special character '"'""")
          else if (c == '\\') {
            if (i + 1 >= s.length) err("unterminated element")
            sb += s.charAt(i + 1); lastContent = sb.length; i += 2
          } else if (c.isWhitespace) { sb += c; i += 1 }
          else { sb += c; lastContent = sb.length; i += 1 }
        }
        (sb.substring(0, lastContent), false)
      }
    }
    ws()
    if (i >= s.length || s.charAt(i) != '{')
      err(s"""expected '{', found ${if (i < s.length) s.charAt(i) else "end of input"}: "$s"""")
    i += 1
    val pairs = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    ws()
    if (i < s.length && s.charAt(i) == '}') { i += 1 }
    else {
      var done = false
      while (!done) {
        val (k, _) = token(isKey = true)
        ws()
        if (i + 1 >= s.length || s.charAt(i) != '=' || s.charAt(i + 1) != '>')
          err(s"expected '=>'")
        i += 2
        val v: Any = vt match {
          case mt: MapType =>
            // nested map value: consume one balanced {..} group
            ws()
            if (i >= s.length || s.charAt(i) != '{') err("expected '{'")
            val start = i
            var depth = 0
            var inQ = false
            var endFound = false
            while (i < s.length && !endFound) {
              val c = s.charAt(i)
              if (inQ) {
                if (c == '\\') i += 1
                else if (c == '"') inQ = false
              } else c match {
                case '\\' => i += 1 // escaped char is content, not structure
                case '"' => inQ = true
                case '{' => depth += 1
                case '}' => depth -= 1; if (depth == 0) endFound = true
                case _ => ()
              }
              i += 1
            }
            if (!endFound) err("unexpected end of input")
            parseMap(s.substring(start, i), mt.valueType)
          case _ =>
            val (raw, quoted) = token(isKey = false)
            if (!quoted && raw.equalsIgnoreCase("null")) null
            else convertScalar(raw, vt)
        }
        pairs.put(k, v) // LAST duplicate wins
        ws()
        if (i >= s.length) err("unexpected end of input")
        else s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => err(s"expected ',' or '}', got '$c'")
        }
      }
    }
    ws()
    if (i < s.length) err(s"malformed map literal: trailing characters")
    val sorted = pairs.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(p => UTF8String.fromString(p._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  private def needsQuote(s: String): Boolean =
    s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
        c == '\\' || c == '=' || c == '>' || c.isWhitespace)

  private def quoted(s: String): String =
    if (needsQuote(s)) "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s

  private def scalarText(v: Any, dt: DataType): String =
    MzListExpressions.scalarText(v, dt)

  /** mz-canonical map text (sorted by key). */
  def renderMap(m: MapData, mt: MapType): String = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    val pairs = (0 until m.numElements()).map { i =>
      val k = keys.get(i, StringType).toString
      val v =
        if (vals.isNullAt(i)) "NULL"
        else mt.valueType match {
          case nested: MapType =>
            renderMap(vals.get(i, nested).asInstanceOf[MapData], nested)
          case at: ArrayType =>
            // list-valued maps embed the list's own braces bare
            MzListExpressions.renderList(vals.get(i, at), at)
          case dt => quoted(scalarText(vals.get(i, dt), dt))
        }
      (k, quoted(k) + "=>" + v)
    }
    // sort by RAW key (maps from sources other than parseMap arrive
    // unsorted)
    pairs.sortBy(_._1).map(_._2).mkString("{", ",", "}")
  }

  /** `mz_map_in('{a=>1}', 'int')` — text -> MapType(text, T). */
  case class MzMapIn(text: Expression, valueTypeExpr: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(text, valueTypeExpr)
    private lazy val vt: DataType = valueDataType(valueTypeExpr.eval(null).toString)
    override lazy val dataType: DataType = MapType(StringType, vt)
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val t = text.eval(input)
      if (t == null) null else parseMap(t.toString, vt)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(text = newChildren(0), valueTypeExpr = newChildren(1))
  }

  /** `mz_map_out(m)` — canonical text. */
  case class MzMapOut(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null
      else UTF8String.fromString(renderMap(v.asInstanceOf[MapData],
        child.dataType.asInstanceOf[MapType]))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("mz_map_in"), info("mz_map_in"),
        (a: Seq[Expression]) => MzMapIn(a(0), a(1))),
      (FunctionIdentifier("mz_map_out"), info("mz_map_out"),
        (a: Seq[Expression]) => MzMapOut(a.head)))
}
