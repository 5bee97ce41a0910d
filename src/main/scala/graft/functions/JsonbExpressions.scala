package graft.functions

import java.math.BigDecimal

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode, TextNode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, OneRowRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pg/reference jsonb semantics over json-as-text columns (the reference's
  * `jsonb` is pg-compatible: `src/repr/src/adt/jsonb.rs`,
  * `src/expr/src/scalar/func.rs` jsonb_* family). Spark has no JSON type;
  * the engine's convention (shared with `fn_json` and the Iceberg/CDC
  * codecs) is canonical jsonb TEXT:
  *
  *  - objects print keys sorted (mz Datum::Map order, NOT pg length-first) with COMPACT separators, duplicate keys last-wins;
  *  - numbers print as pg numeric (exponent expanded, trailing zeros kept);
  *  - `jsonb_canon` is the `::jsonb` cast (the SLT shim rewrites casts to
  *    it), and every accessor returns canonical text, so chained operators
  *    compose exactly like pg's.
  *
  * All expressions are CodegenFallback — jsonb records are parsed with
  * Jackson (already on Spark's classpath) per call; the engine's columnar
  * hot paths (fn_json, media/codec pipelines) stay on codegen'd built-ins,
  * this family exists for pg-dialect fidelity. */
object JsonbValue {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** The reference's jsonb key order: PLAIN bytewise (`Datum::Map` sorts
    * by key bytes) — unlike pg jsonb's length-first order. */
  private[functions] val keyOrder: Ordering[String] = (a: String, b: String) => {
    val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
    var i = 0
    var r = 0
    val n = math.min(ab.length, bb.length)
    while (i < n && r == 0) {
      r = (ab(i) & 0xFF) - (bb(i) & 0xFF)
      i += 1
    }
    if (r != 0) r else ab.length - bb.length
  }

  def renderNumber(d: BigDecimal): String = d.toPlainString

  private def renderString(s: String, sb: StringBuilder): Unit = {
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
  }

  def render(n: JsonNode): String = {
    val sb = new StringBuilder
    renderTo(n, sb)
    sb.toString
  }

  private def renderTo(n: JsonNode, sb: StringBuilder): Unit = n match {
    case o: ObjectNode =>
      sb += '{'
      val keys = o.fieldNames.asScala.toSeq.sorted(keyOrder)
      keys.zipWithIndex.foreach { case (k, i) =>
        if (i > 0) sb += ','
        renderString(k, sb)
        sb += ':' 
        renderTo(o.get(k), sb)
      }
      sb += '}'
    case a: ArrayNode =>
      sb += '['
      a.elements.asScala.zipWithIndex.foreach { case (e, i) =>
        if (i > 0) sb += ','
        renderTo(e, sb)
      }
      sb += ']'
    case t: TextNode => renderString(t.textValue, sb)
    case x if x.isNumber => sb ++= renderNumber(x.decimalValue)
    case x if x.isBoolean => sb ++= (if (x.booleanValue) "true" else "false")
    case _ => sb ++= "null"
  }

  def canon(s: String): String = render(parse(s))

  /** jsonb numbers are mz numeric: more than 39 integral digits overflow
    * on INPUT (reference numeric.rs max precision 39; jsonb.slt pins the
    * cast rejection). Walk the parsed tree before rendering. */
  def checkNumericRange(n: JsonNode): Unit = n match {
    case o: ObjectNode => o.fields.asScala.foreach(e => checkNumericRange(e.getValue))
    case a: ArrayNode => a.elements.asScala.foreach(checkNumericRange)
    case x if x.isNumber =>
      val bd = x.decimalValue.stripTrailingZeros
      if (bd.precision - bd.scale > 39)
        throw new IllegalArgumentException(
          s"""invalid input syntax for type jsonb: "${bd.toPlainString}" is """ +
            "out of range for type numeric: exceeds maximum precision 39")
    case _ => ()
  }

  /** pg `->`: object key / array index (negative wraps); NULL on scalars,
    * missing keys, out-of-range. */
  def get(node: JsonNode, key: scala.util.Either[String, Int]): Option[JsonNode] =
    (node, key) match {
      case (o: ObjectNode, scala.util.Left(k)) => Option(o.get(k))
      case (a: ArrayNode, scala.util.Right(i0)) =>
        val i = if (i0 < 0) a.size + i0 else i0
        if (i >= 0 && i < a.size) Some(a.get(i)) else None
      // a text key never subscripts an array (no implicit cast in pg)
      case (_: ArrayNode, scala.util.Left(_)) => None
      // pg treats scalars as one-element arrays for int subscripts
      case (scalar, scala.util.Right(i)) if !scalar.isContainerNode =>
        if (i == 0 || i == -1) Some(scalar) else None
      case _ => None
    }

  /** `->>` / `#>>`: scalar values as raw text, json null → SQL NULL. */
  def asText(n: JsonNode): Option[String] = n match {
    case _ if n.isNull => None
    case t: TextNode => Some(t.textValue)
    case x if x.isNumber => Some(renderNumber(x.decimalValue))
    case x if x.isBoolean => Some(if (x.booleanValue) "true" else "false")
    case other => Some(render(other))
  }

  /** Parse a pg text-array literal `{a,b,"c d"}` into its elements. */
  def pgArrayElems(lit: String): Seq[String] = {
    val t = lit.trim.stripPrefix("{").stripSuffix("}")
    if (t.isEmpty) Seq.empty
    else {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var inQ = false
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (inQ) {
          if (c == '\\' && i + 1 < t.length) { cur += t.charAt(i + 1); i += 1 }
          else if (c == '"') inQ = false
          else cur += c
        } else c match {
          case '"' => inQ = true
          case ',' => out += cur.toString.trim; cur.clear()
          case x => cur += x
        }
        i += 1
      }
      out += cur.toString.trim
      out.toList
    }
  }

  def getPath(node: JsonNode, path: Seq[String]): Option[JsonNode] =
    path.foldLeft(Option(node)) { (cur, k) =>
      cur.flatMap { n =>
        if (n.isArray)
          try get(n, scala.util.Right(k.trim.toInt))
          catch { case _: NumberFormatException => None }
        else get(n, scala.util.Left(k))
      }
    }

  /** pg `@>` containment. */
  def contains(l: JsonNode, r: JsonNode): Boolean = (l, r) match {
    case (lo: ObjectNode, ro: ObjectNode) =>
      ro.fields.asScala.forall { e =>
        val lv = lo.get(e.getKey)
        lv != null && containsAtTop(lv, e.getValue)
      }
    case (la: ArrayNode, ra: ArrayNode) =>
      ra.elements.asScala.forall(re =>
        la.elements.asScala.exists(le => containsAtTop(le, re)))
    case (la: ArrayNode, scalar) if !scalar.isContainerNode =>
      la.elements.asScala.exists(_ == scalar)
    case (a, b) => a == b
  }

  /** Nested containment: objects recurse, scalars compare equal (pg does
    * NOT unwrap arrays below the top level). */
  private def containsAtTop(l: JsonNode, r: JsonNode): Boolean = (l, r) match {
    case (lo: ObjectNode, ro: ObjectNode) => contains(lo, ro)
    case (la: ArrayNode, ra: ArrayNode) => contains(la, ra)
    case (a, b) => a == b
  }

  def exists(l: JsonNode, key: String): Boolean = l match {
    case o: ObjectNode => o.has(key)
    case a: ArrayNode => a.elements.asScala.exists(e => e.isTextual && e.textValue == key)
    case t: TextNode => t.textValue == key
    case _ => false
  }

  def stripNulls(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = JsonNodeFactory.instance.objectNode
      o.fields.asScala.foreach { e =>
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, stripNulls(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = JsonNodeFactory.instance.arrayNode
      a.elements.asScala.foreach(e => out.add(stripNulls(e)))
      out
    case x => x
  }

  def typeOf(n: JsonNode): String =
    if (n.isNull) "null"
    else if (n.isBoolean) "boolean"
    else if (n.isNumber) "number"
    else if (n.isTextual) "string"
    else if (n.isArray) "array"
    else "object"

  /** SQL value → JsonNode, for to_jsonb / jsonb_build_*. */
  def fromSql(v: Any, dt: DataType): JsonNode = {
    val f = JsonNodeFactory.instance
    if (v == null) return f.nullNode
    dt match {
      case StringType => f.textNode(v.toString)
      case BooleanType => f.booleanNode(v.asInstanceOf[Boolean])
      case ByteType | ShortType | IntegerType | LongType =>
        f.numberNode(new BigDecimal(v.toString))
      case FloatType | DoubleType =>
        f.numberNode(new BigDecimal(v.toString))
      case _: DecimalType =>
        f.numberNode(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case TimestampType | TimestampNTZType =>
        // pg renders timestamps as text inside jsonb
        val micros = v.asInstanceOf[Long]
        val secs = Math.floorDiv(micros, 1000000L)
        val frac = Math.floorMod(micros, 1000000L)
        val base = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        f.textNode(if (frac == 0) base else f"$base.$frac%06d".replaceAll("0+$", ""))
      case DateType =>
        f.textNode(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case BinaryType =>
        f.textNode("\\x" + v.asInstanceOf[Array[Byte]].map(b => f"$b%02x").mkString)
      case ArrayType(et, _) =>
        val arr = f.arrayNode
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .foreach(et, (_, e) => { arr.add(fromSql(e, et)); () })
        arr
      case st: StructType =>
        val row = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val obj = f.objectNode
        st.fields.zipWithIndex.foreach { case (fld, i) =>
          // pg names anonymous row-constructor fields f1..fN; Spark colN
          val name = if (fld.name.matches("col\\d+")) "f" + fld.name.drop(3) else fld.name
          obj.set[JsonNode](name, fromSql(row.get(i, fld.dataType), fld.dataType))
        }
        obj
      case _ => f.textNode(v.toString)
    }
  }
}

/** Unary jsonb expression base: string in, parse once, eval. */
abstract class JsonbUnary extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  protected def evalNode(n: JsonNode): Any
  override protected def nullSafeEval(s: Any): Any =
    evalNode(JsonbValue.parse(s.toString))
}

case class JsonbCanon(child: Expression) extends JsonbUnary {
  override protected def evalNode(n: JsonNode): Any = {
    JsonbValue.checkNumericRange(n)
    UTF8String.fromString(JsonbValue.render(n))
  }
  override protected def withNewChildInternal(c: Expression): JsonbCanon = copy(child = c)
}

case class JsonbTypeof(child: Expression) extends JsonbUnary {
  override protected def evalNode(n: JsonNode): Any =
    UTF8String.fromString(JsonbValue.typeOf(n))
  override protected def withNewChildInternal(c: Expression): JsonbTypeof = copy(child = c)
}

case class JsonbStripNulls(child: Expression) extends JsonbUnary {
  override protected def evalNode(n: JsonNode): Any =
    UTF8String.fromString(JsonbValue.render(JsonbValue.stripNulls(n)))
  override protected def withNewChildInternal(c: Expression): JsonbStripNulls =
    copy(child = c)
}

/** `->` / `->>`: key may be text (object field) or integer (array index). */
case class JsonbGet(left: Expression, right: Expression, asText: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL for missing keys / OOB
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val node = JsonbValue.parse(l.toString)
    val key = right.dataType match {
      case StringType => scala.util.Left(r.toString)
      case _ => scala.util.Right(r.toString.toDouble.toInt)
    }
    JsonbValue.get(node, key) match {
      case None => null
      case Some(v) =>
        if (asText) JsonbValue.asText(v).map(UTF8String.fromString).orNull
        else UTF8String.fromString(JsonbValue.render(v))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbGet =
    copy(left = l, right = r)
}

/** `#>` / `#>>` with a pg text-array path literal (`'{a,b}'`). */
case class JsonbGetPath(left: Expression, right: Expression, asText: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL for missing paths
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val node = JsonbValue.parse(l.toString)
    val path = JsonbValue.pgArrayElems(r.toString)
    JsonbValue.getPath(node, path) match {
      case None => null
      case Some(v) =>
        if (asText) JsonbValue.asText(v).map(UTF8String.fromString).orNull
        else UTF8String.fromString(JsonbValue.render(v))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbGetPath =
    copy(left = l, right = r)
}

/** `||` per the reference's jsonb_concat arms (src/expr/src/scalar/func.rs:1944):
  * object||object merges (rhs wins), array||array concatenates, and an array
  * beside ANY other value appends/prepends that value — including an object,
  * so `'[1]' || '{"a":1}'` = `[1,{"a":1}]`. Every arm without an array or a
  * two-object merge (scalar||scalar, object||scalar) is NULL — unlike pg,
  * which wraps scalars into singleton arrays. */
case class JsonbConcat(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // mz: arms without a list are NULL
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val f = JsonNodeFactory.instance
    val (ln, rn) = (JsonbValue.parse(l.toString), JsonbValue.parse(r.toString))
    val out: JsonNode = (ln, rn) match {
      case (lo: ObjectNode, ro: ObjectNode) =>
        val m = f.objectNode
        lo.fields.asScala.foreach(e => m.set[JsonNode](e.getKey, e.getValue))
        ro.fields.asScala.foreach(e => m.set[JsonNode](e.getKey, e.getValue))
        m
      case (la: ArrayNode, ra: ArrayNode) =>
        val a = f.arrayNode
        la.elements.asScala.foreach(a.add)
        ra.elements.asScala.foreach(a.add)
        a
      case (la: ArrayNode, _) => // append rhs (object or scalar) as one element
        val a = f.arrayNode
        la.elements.asScala.foreach(a.add)
        a.add(rn)
        a
      case (_, ra: ArrayNode) => // prepend lhs as one element
        val a = f.arrayNode
        a.add(ln)
        ra.elements.asScala.foreach(a.add)
        a
      case _ => null // scalar/object mixes without an array side
    }
    if (out == null) null else UTF8String.fromString(JsonbValue.render(out))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbConcat =
    copy(left = l, right = r)
}

/** pg `-`: delete an object key / array index (int) or equal string
  * elements (text); deleting from a scalar, or an object by index, errors
  * exactly like pg. */
case class JsonbDelete(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // mz: invalid delete targets are NULL
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val f = JsonNodeFactory.instance
    val n = JsonbValue.parse(l.toString)
    val intKey = right.dataType match {
      case StringType => None
      case _ => Some(r.toString.toDouble.toInt)
    }
    val out: JsonNode = (n, intKey) match {
      case (a: ArrayNode, Some(i0)) =>
        val i = if (i0 < 0) a.size + i0 else i0
        val cp = f.arrayNode
        a.elements.asScala.zipWithIndex.foreach { case (e, j) =>
          if (j != i) cp.add(e)
        }
        cp
      case (a: ArrayNode, None) =>
        val cp = f.arrayNode
        a.elements.asScala.foreach(e =>
          if (!(e.isTextual && e.textValue == r.toString)) cp.add(e))
        cp
      case (o: ObjectNode, None) =>
        val cp = f.objectNode
        o.fields.asScala.foreach(e =>
          if (e.getKey != r.toString) cp.set[JsonNode](e.getKey, e.getValue))
        cp
      // the reference returns NULL for object-by-index and scalar deletes
      case _ => null
    }
    if (out == null) null else UTF8String.fromString(JsonbValue.render(out))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbDelete =
    copy(left = l, right = r)
}

case class JsonbContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JsonbValue.contains(JsonbValue.parse(l.toString), JsonbValue.parse(r.toString))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbContains =
    copy(left = l, right = r)
}

case class JsonbExists(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JsonbValue.exists(JsonbValue.parse(l.toString), r.toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonbExists =
    copy(left = l, right = r)
}

/** to_jsonb / jsonb_build_array / jsonb_build_object over SQL values. */
case class JsonbBuild(children: Seq[Expression], mode: String,
    jsonbMask: Seq[Boolean] = Seq.empty)
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = mode == "to" || mode == "identity"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = JsonNodeFactory.instance
    val mask = if (jsonbMask.length == children.length) jsonbMask
               else children.map(_ => false)
    val vals = children.zip(mask).map { case (c, jb) => (c.eval(input), c.dataType, jb) }
    def node(v: Any, dt: DataType, jb: Boolean): JsonNode =
      if (jb && v != null) JsonbValue.parse(v.toString) else JsonbValue.fromSql(v, dt)
    mode match {
      case "to" =>
        val (v, dt, _) = vals.head
        if (v == null) null
        else UTF8String.fromString(JsonbValue.render(JsonbValue.fromSql(v, dt)))
      case "identity" =>
        vals.head._1 // child already produces canonical jsonb text
      case "array" =>
        val arr = f.arrayNode
        vals.foreach { case (v, dt, jb) => arr.add(node(v, dt, jb)) }
        UTF8String.fromString(JsonbValue.render(arr))
      case "object" =>
        require(vals.length % 2 == 0, "jsonb_build_object needs even arg count")
        val obj = f.objectNode
        vals.grouped(2).foreach { case Seq((k, _, _), (v, dt, jb)) =>
          require(k != null, "jsonb_build_object key must not be null")
          obj.set[JsonNode](k.toString, node(v, dt, jb))
        }
        UTF8String.fromString(JsonbValue.render(obj))
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Array-of-canonical-text producers backing the jsonb table functions. */
case class JsonbElems(child: Expression, mode: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(s: Any): Any = {
    val n = JsonbValue.parse(s.toString)
    // non-matching input is the EMPTY SET in the reference, not an error
    val out: Seq[String] = mode match {
      case "elements" =>
        if (!n.isArray) Seq.empty else n.elements.asScala.map(JsonbValue.render).toSeq
      case "elements_text" =>
        if (!n.isArray) Seq.empty
        else n.elements.asScala.map(e => JsonbValue.asText(e).orNull).toSeq
      case "keys" =>
        if (!n.isObject) Seq.empty else n.fieldNames.asScala.toSeq
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.map(x => if (x == null) null else UTF8String.fromString(x)).toArray)
  }
  override protected def withNewChildInternal(c: Expression): JsonbElems = copy(child = c)
}

/** `jsonb_each[_text]` pair array (reference func.rs JsonbEach): object
  * fields in canonical (sorted) key order as (key, value) structs; non-
  * object input is the empty set. `asText` unwraps string values. */
case class JsonbPairs(child: Expression, asText: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType))), containsNull = false)
  override protected def nullSafeEval(s: Any): Any = {
    val n = JsonbValue.parse(s.toString)
    val rows: Seq[org.apache.spark.sql.catalyst.InternalRow] =
      if (!n.isObject) Seq.empty
      else n.fieldNames.asScala.toSeq.sorted(JsonbValue.keyOrder).map { k =>
        val v = n.get(k)
        val out = if (asText) JsonbValue.asText(v).orNull else JsonbValue.render(v)
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(k),
          if (out == null) null else UTF8String.fromString(out))
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }
  override protected def withNewChildInternal(c: Expression): JsonbPairs =
    copy(child = c)
}

object JsonbFunctions {
  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  /** Is this (already-resolved) argument a jsonb-producing expression? The
    * mask is computed at build time because ConstantFolding later replaces
    * foldable jsonb calls with plain string literals. */
  private def isJsonbArg(e: Expression): Boolean = e match {
    case _: JsonbCanon | _: JsonbGet | _: JsonbGetPath | _: JsonbStripNulls |
         _: JsonbConcat | _: JsonbDelete => true
    case b: JsonbBuild => b.mode != "to"
    case _ => false
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("jsonb_canon", (a: Seq[Expression]) => JsonbCanon(a.head)),
      ("jsonb_typeof", (a: Seq[Expression]) => JsonbTypeof(a.head)),
      ("jsonb_strip_nulls", (a: Seq[Expression]) => JsonbStripNulls(a.head)),
      ("jsonb_get", (a: Seq[Expression]) => JsonbGet(a(0), a(1), asText = false)),
      ("jsonb_get_text", (a: Seq[Expression]) => JsonbGet(a(0), a(1), asText = true)),
      ("jsonb_get_path", (a: Seq[Expression]) => JsonbGetPath(a(0), a(1), asText = false)),
      ("jsonb_get_path_text", (a: Seq[Expression]) => JsonbGetPath(a(0), a(1), asText = true)),
      ("jsonb_contains", (a: Seq[Expression]) => JsonbContains(a(0), a(1))),
      ("jsonb_exists", (a: Seq[Expression]) => JsonbExists(a(0), a(1))),
      ("jsonb_concat", (a: Seq[Expression]) => JsonbConcat(a(0), a(1))),
      ("jsonb_delete", (a: Seq[Expression]) => JsonbDelete(a(0), a(1))),
      // to_jsonb of a value that is ALREADY jsonb text is the identity —
      // dispatch on the producing expression, the only type marker we have
      ("to_jsonb", (a: Seq[Expression]) => a.head match {
        case x if isJsonbArg(x) => JsonbBuild(a, "identity")
        case _ => JsonbBuild(a, "to")
      }),
      ("jsonb_build_array",
        (a: Seq[Expression]) => JsonbBuild(a, "array", a.map(isJsonbArg))),
      // un-exploded array forms for the SLT shim's multi-SRF lockstep zip
      ("graft_jsonb_arr_elements",
        (a: Seq[Expression]) => JsonbElems(a.head, "elements")),
      ("graft_jsonb_arr_elements_text",
        (a: Seq[Expression]) => JsonbElems(a.head, "elements_text")),
      ("graft_jsonb_arr_keys",
        (a: Seq[Expression]) => JsonbElems(a.head, "keys")),
      ("jsonb_build_object",
        (a: Seq[Expression]) => JsonbBuild(a, "object", a.map(isJsonbArg))),
      // jsonb_array_length: element count of a json array; NULL for
      // objects/scalars (the reference's nullable conversion)
      ("jsonb_array_length",
        (a: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.If(
            org.apache.spark.sql.catalyst.expressions.EqualTo(
              JsonbTypeof(a.head),
              org.apache.spark.sql.catalyst.expressions.Literal("array")),
            org.apache.spark.sql.catalyst.expressions.Size(
              JsonbElems(a.head, "elements")),
            org.apache.spark.sql.catalyst.expressions.Literal.create(null,
              org.apache.spark.sql.types.IntegerType))))
      .map { case (n, b) => (FunctionIdentifier(n), info(n), b) }

  /** FROM-position table functions (scalar-position SRF forms included). */
  def tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq("jsonb_array_elements" -> "elements",
      "jsonb_array_elements_text" -> "elements_text",
      "jsonb_object_keys" -> "keys").map { case (n, mode) =>
      (FunctionIdentifier(n), info(n), (args: Seq[Expression]) =>
        Generate(Explode(JsonbElems(args.head, mode)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Nil,
          child = OneRowRelation()))
    } ++ Seq("jsonb_each" -> false, "jsonb_each_text" -> true).map {
      case (n, asText) =>
        // SETOF (key, value) via the Inline generator over the pair array
        (FunctionIdentifier(n), info(n), (args: Seq[Expression]) =>
          Generate(Inline(JsonbPairs(args.head, asText)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Nil, child = OneRowRelation()))
    }

  def scalarSrfs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq("jsonb_array_elements" -> "elements",
      "jsonb_array_elements_text" -> "elements_text",
      "jsonb_object_keys" -> "keys").map { case (n, mode) =>
      (FunctionIdentifier(n), info(n),
        (args: Seq[Expression]) => Explode(JsonbElems(args.head, mode)))
    }
}
