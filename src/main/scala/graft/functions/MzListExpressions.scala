package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's LIST type re-expressed over Spark arrays (reference
  * `src/repr/src/adt` list parsing/rendering; `src/repr/src/strconv.rs`
  * parse_list / format_list; corpus test/sqllogictest/list.slt).
  *
  * A LIST value IS a Spark `ArrayType` (nested for LIST LIST): every array
  * builtin (concat, element ops, unnest, pg_subscript) composes for free.
  * Only the TEXT boundary is mz-specific:
  *  - `mz_list_in(text, elemType, depth)` parses the mz list input form —
  *    bare / quoted elements, backslash escapes (escaped whitespace is
  *    content, unescaped trailing whitespace trims), quoted elements at
  *    depth > 1 re-parse as nested lists, `NULL` keyword only when fully
  *    unescaped — raising the reference's `invalid input syntax for type
  *    list: ...` errors on malformed input;
  *  - `mz_list_out(list)` renders the canonical text: elements quoted
  *    when empty, spelling NULL, or containing braces / comma / quote /
  *    backslash / whitespace, with `\` and `"` escaped; nested lists embed
  *    their own braces bare.
  */
object MzListExpressions {

  // ---------------- text parsing ----------------

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException("invalid input syntax for type list: " + msg)

  /** Parse `s` as a depth-`depth` list with scalar converter `elem`
    * (returns CATALYST values). */
  def parseList(s: String, depth: Int, elem: String => Any): Any = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseLevel(d: Int): ArrayData = {
      ws()
      if (i >= s.length || s.charAt(i) != '{')
        err("malformed literal; missing '{'")
      i += 1
      val out = scala.collection.mutable.ListBuffer.empty[Any]
      ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return new GenericArrayData(out.toArray) }
      var done = false
      while (!done) {
        ws()
        out += parseElement(d)
        ws()
        if (i >= s.length) err("unexpected end of input")
        else s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => err(s"expected ',' or '}', got '$c'")
        }
      }
      new GenericArrayData(out.toArray)
    }
    def parseElement(d: Int): Any = {
      if (i < s.length && s.charAt(i) == '{') {
        if (d <= 1) err("malformed literal; must escape special character '{'")
        parseLevel(d - 1)
      } else if (i < s.length && s.charAt(i) == '"') {
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= s.length) err("unexpected end of input")
          val c = s.charAt(i)
          if (c == '\\') {
            if (i + 1 >= s.length) err("unexpected end of input")
            sb += s.charAt(i + 1); i += 2
          } else if (c == '"') { closed = true; i += 1 }
          else { sb += c; i += 1 }
        }
        // a quoted element at list depth is itself a list literal
        if (d > 1) parseList(sb.toString, d - 1, elem) else elem(sb.toString)
      } else {
        val sb = new StringBuilder
        var lastContent = 0 // prefix length that may not be trimmed
        var sawEscape = false
        var any = false
        var stop = false
        while (!stop) {
          if (i >= s.length) err("unterminated element")
          s.charAt(i) match {
            case ',' | '}' => stop = true
            case '{' => err("malformed literal; must escape special character '{'")
            case '"' => err("malformed literal; must escape special character '\"'")
            case '\\' =>
              if (i + 1 >= s.length) err("unterminated element")
              sb += s.charAt(i + 1); lastContent = sb.length
              sawEscape = true; any = true; i += 2
            case c if c.isWhitespace => sb += c; i += 1
            case c => sb += c; lastContent = sb.length; any = true; i += 1
          }
        }
        if (!any) err("malformed literal; missing element")
        val raw = sb.substring(0, lastContent)
        if (!sawEscape && raw.equalsIgnoreCase("null")) null
        else if (d > 1)
          err(s"malformed literal; must escape special character or use nested braces")
        else elem(raw)
      }
    }
    ws()
    val r = parseLevel(depth)
    ws()
    if (i < s.length)
      err(s"malformed array literal; contains '${s.charAt(i)}' after terminal '}'")
    r
  }

  private[functions] def scalarType(name: String): DataType =
    name.toLowerCase.replaceAll("\\s+", " ") match {
      case "int" | "integer" | "int4" | "int2" | "smallint" | "oid" => IntegerType
      case "bigint" | "int8" => LongType
      case "text" | "string" | "varchar" | "char" | "bpchar" => StringType
      case "double" | "double precision" | "float8" | "float" => DoubleType
      case "real" | "float4" => FloatType
      case "bool" | "boolean" => BooleanType
      case "date" => DateType
      case "timestamp" | "timestamptz" => TimestampType
      case "numeric" | "decimal" => DoubleType // rendered without trailing zeros
      case other => throw new IllegalArgumentException(
        s"""type "$other list" does not exist""")
    }

  private[functions] def converter(dt: DataType): String => Any = dt match {
    case IntegerType => s =>
      try s.trim.toInt catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type integer: "$s"""") }
    case LongType => s =>
      try s.trim.toLong catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type bigint: "$s"""") }
    case DoubleType => s =>
      try s.trim.toDouble catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type double precision: "$s"""") }
    case FloatType => s =>
      try s.trim.toFloat catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type real: "$s"""") }
    case BooleanType => s => s.trim.toLowerCase match {
      case "t" | "true" | "yes" | "on" | "1" => true
      case "f" | "false" | "no" | "off" | "0" => false
      case o => throw new IllegalArgumentException(
        s"""invalid input syntax for type boolean: "$o"""")
    }
    case DateType => s =>
      try java.time.LocalDate.parse(s.trim).toEpochDay.toInt
      catch { case _: Exception => throw new IllegalArgumentException(
        s"""invalid input syntax for type date: "$s"""") }
    case TimestampType => s =>
      try {
        val t = s.trim.replace(' ', 'T')
        val ldt = java.time.LocalDateTime.parse(
          if (t.contains('T')) t else t + "T00:00:00")
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      } catch { case _: Exception => throw new IllegalArgumentException(
        s"""invalid input syntax for type timestamp: "$s"""") }
    case _ => s => UTF8String.fromString(s)
  }

  // ---------------- text rendering ----------------

  private def needsQuote(s: String): Boolean =
    s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
        c == '\\' || c.isWhitespace)

  private[functions] def scalarText(v: Any, dt: DataType): String = (v, dt) match {
    case (s: UTF8String, _) => s.toString
    case (b: Boolean, _) => if (b) "t" else "f"
    case (d: Double, _) =>
      if (d.isInfinite) { if (d > 0) "inf" else "-inf" }
      else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case (f: Float, _) =>
      // float4 renders at ITS precision ("1.2", not the double-widened
      // 1.2000000476837158)
      if (f.isInfinite) { if (f > 0) "inf" else "-inf" }
      else if (f == math.floor(f) && math.abs(f) < 1e15f) f.toLong.toString
      else f.toString
    case (days: Int, DateType) =>
      java.time.LocalDate.ofEpochDay(days.toLong).toString
    case (us: Long, TimestampType) =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      ldt.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss" +
            (if (ldt.getNano != 0) ".SSSSSS" else "")))
        .replaceAll("(\\.\\d*?)0+$", "$1").stripSuffix(".")
    case (d: org.apache.spark.sql.types.Decimal, _) =>
      d.toJavaBigDecimal.stripTrailingZeros.toPlainString
    case (b: Array[Byte], _) =>
      // pg bytea hex output form (strconv.rs format_bytes)
      b.map(x => f"$x%02x").mkString("\\x", "", "")
    case (row: org.apache.spark.sql.catalyst.InternalRow, st: StructType) =>
      // pg record text: (f1,f2,..) with NULL fields empty; array/list
      // fields embed their {..} render bare (mz Datum render)
      st.fields.zipWithIndex.map { case (f, i) =>
        if (row.isNullAt(i)) ""
        else f.dataType match {
          case at: ArrayType => renderList(row.get(i, at), at)
          case _ => scalarText(row.get(i, f.dataType), f.dataType)
        }
      }.mkString("(", ",", ")")
    case (o, _) => String.valueOf(o)
  }

  /** mz-canonical list text of a Catalyst array value. */
  def renderList(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "NULL"
    case (arr: ArrayData, ArrayType(et, _)) =>
      (0 until arr.numElements()).map { i =>
        if (arr.isNullAt(i)) "NULL"
        else et match {
          case nested: ArrayType => renderList(arr.get(i, nested), nested)
          case _ =>
            val s = scalarText(arr.get(i, et), et)
            if (needsQuote(s))
              "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
            else s
        }
      }.mkString("{", ",", "}")
    case (o, _) => String.valueOf(o)
  }

  // ---------------- expressions ----------------

  /** `mz_list_in('{...}', 'int', 2)` — text form -> nested typed array. */
  case class MzListIn(text: Expression, typeName: Expression, depthExpr: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(text, typeName, depthExpr)
    private lazy val elemDt: DataType =
      scalarType(typeName.eval(null).toString)
    private lazy val depth: Int = depthExpr.eval(null).toString.toInt
    override lazy val dataType: DataType =
      (1 to depth).foldLeft(elemDt)((t, _) => ArrayType(t))
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val t = text.eval(input)
      if (t == null) null
      else parseList(t.toString, depth, converter(elemDt))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(text = newChildren(0), typeName = newChildren(1), depthExpr = newChildren(2))
  }

  /** `mz_list_out(list)` — mz-canonical text of any array value. */
  case class MzListOut(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null
      else UTF8String.fromString(renderList(v, child.dataType))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `record::text` — pg composite text `(f1,f2)` (NULL fields empty,
    * array fields in their brace form). */
  case class MzRecordOut(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null
      else UTF8String.fromString(scalarText(v, child.dataType))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `list_length_max(list, dim)` — max list length at nesting depth `dim`
    * (reference list_length_max; dim 1 = outermost). NULL on NULL input. */
  case class MzListLengthMax(list: Expression, dimExpr: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(list, dimExpr)
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = list.eval(input)
      val d = dimExpr.eval(input)
      if (v == null || d == null) return null
      val dim = d.toString.toInt
      def depthOf(t: DataType): Int = t match {
        case ArrayType(e, _) => 1 + depthOf(e); case _ => 0
      }
      val maxDim = depthOf(list.dataType)
      if (dim < 1 || dim > maxDim)
        throw new IllegalArgumentException(
          s"invalid dimension: $dim; must be between 1 and $maxDim")
      // NULL sublists contribute no length: max over none is NULL
      def walk(a: ArrayData, t: ArrayType, at: Int): Option[Int] =
        if (at == dim) Some(a.numElements())
        else {
          val subs = (0 until a.numElements()).flatMap { i =>
            if (a.isNullAt(i)) None
            else walk(a.get(i, t.elementType).asInstanceOf[ArrayData],
              t.elementType.asInstanceOf[ArrayType], at + 1)
          }
          if (subs.isEmpty) None else Some(subs.max)
        }
      walk(v.asInstanceOf[ArrayData],
        list.dataType.asInstanceOf[ArrayType], 1).map(Int.box).orNull
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(list = newChildren(0), dimExpr = newChildren(1))
  }

  /** Numeric widening across list operands (the reference promotes
    * smallint+bigint list args to bigint list). */
  private[functions] def widerOf(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x, y) if Seq(x, y).forall(t => t == ShortType || t == IntegerType ||
        t == LongType) =>
      // mz resolves MIXED integer widths for polymorphic list ops at the
      // i64 overload ('smallint list || 2' is bigint list, list.slt)
      LongType
    case (x, y) if Seq(x, y).forall(t => t == ShortType || t == IntegerType ||
        t == LongType || t == FloatType || t == DoubleType) =>
      val rank = Map[DataType, Int](ShortType -> 1, IntegerType -> 2,
        LongType -> 3, FloatType -> 4, DoubleType -> 5)
      if (rank(x) >= rank(y)) x else y
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(widerOf(x, y))
    case (x, _) => x
  }

  private def widenVal(v: Any, from: DataType, to: DataType): Any = (v, to) match {
    case (null, _) => null
    case (n: Number, LongType) => n.longValue
    case (n: Number, IntegerType) => n.intValue
    case (n: Number, DoubleType) => n.doubleValue
    case (n: Number, FloatType) => n.floatValue
    case (a: ArrayData, ArrayType(te, _)) =>
      val fe = from match { case ArrayType(e, _) => e; case _ => te }
      new GenericArrayData((0 until a.numElements()).map { i =>
        if (a.isNullAt(i)) null else widenVal(a.get(i, fe), fe, te)
      }.toArray)
    case (o, _) => o
  }

  /** Collect a Catalyst array's elements as plain values, widening
    * numerics to `to`. */
  private def elems(a: ArrayData, from: DataType, to: DataType): Array[Any] =
    (0 until a.numElements()).map { i =>
      if (a.isNullAt(i)) null else widenVal(a.get(i, from), from, to)
    }.toArray

  private[functions] def depthOf(t: DataType): Int = t match {
    case ArrayType(e, _) => 1 + depthOf(e)
    case _ => 0
  }

  /** `list_append(list, elem)` / `list_prepend(elem, list)` with pg NULL
    * semantics (a NULL list yields a single-element list, unlike Spark's
    * array_append) and mz's numeric promotion. */
  case class MzListAppend(list: Expression, elem: Expression, prepend: Boolean)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(list, elem)
    private lazy val listElem: DataType = list.dataType match {
      case ArrayType(e, _) => e
      case _ => NullType
    }
    private lazy val elemT: DataType = widerOf(listElem, elem.dataType)
    override lazy val dataType: DataType = ArrayType(elemT)
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = list.eval(input)
      val e = widenVal(elem.eval(input), elem.dataType, elemT)
      val prior: Array[Any] = l match {
        case a: ArrayData => elems(a, listElem, elemT)
        case _ => Array.empty[Any]
      }
      new GenericArrayData(if (prepend) e +: prior else prior :+ e)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(list = newChildren(0), elem = newChildren(1))
  }

  /** `l1 || l2` / `list_cat(l1, l2)` — pg NULL semantics (NULL || l == l)
    * with mz's numeric promotion AND mz's depth mixing: when the depths
    * differ by one, the shallower side joins as an ELEMENT of the deeper
    * (`{{1},{2}} || {3}` == `{{1},{2},{3}}` — reference list concat). */
  case class MzListCat(l1: Expression, l2: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(l1, l2)
    private def elemOf(e: Expression): DataType = e.dataType match {
      case ArrayType(t, _) => t
      case _ => NullType
    }
    // 1: right joins as element; -1: left joins as element; 0: concat.
    // A BARE untyped NULL operand is a NULL list of the other side's
    // type (concat), never an element.
    private lazy val mode: Int = {
      if (l1.dataType == NullType || l2.dataType == NullType) 0
      else {
        val d = depthOf(l1.dataType) - depthOf(l2.dataType)
        if (d >= -1 && d <= 1) d else 0
      }
    }
    private lazy val elemT: DataType = mode match {
      case 1 => widerOf(elemOf(l1), l2.dataType)
      case -1 => widerOf(l1.dataType, elemOf(l2))
      case _ => widerOf(elemOf(l1), elemOf(l2))
    }
    override lazy val dataType: DataType = ArrayType(elemT)
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = l1.eval(input)
      val b = l2.eval(input)
      mode match {
        case 1 =>
          val prior = a match {
            case x: ArrayData => elems(x, elemOf(l1), elemT); case _ => Array.empty[Any] }
          new GenericArrayData(prior :+ widenVal(b, l2.dataType, elemT))
        case -1 =>
          val tail = b match {
            case x: ArrayData => elems(x, elemOf(l2), elemT); case _ => Array.empty[Any] }
          new GenericArrayData(widenVal(a, l1.dataType, elemT) +: tail)
        case _ =>
          if (a == null && b == null) return null
          val av = a match {
            case x: ArrayData => elems(x, elemOf(l1), elemT); case _ => Array.empty[Any] }
          val bv = b match {
            case x: ArrayData => elems(x, elemOf(l2), elemT); case _ => Array.empty[Any] }
          new GenericArrayData(av ++ bv)
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(l1 = newChildren(0), l2 = newChildren(1))
  }

  /** pg rounds on float/numeric -> integral casts (half away from zero);
    * Spark truncates. Element-wise rounding conversion for array casts. */
  def roundConvert(v: Any, from: DataType, to: DataType): Any = (v, from, to) match {
    case (null, _, _) => null
    case (a: ArrayData, ArrayType(fe, _), ArrayType(te, _)) =>
      new GenericArrayData((0 until a.numElements()).map { i =>
        if (a.isNullAt(i)) null else roundConvert(a.get(i, fe), fe, te)
      }.toArray)
    case (n, f, t) if isFloating(f) && isIntegral(t) =>
      // pg float8 -> int rounds HALF EVEN; numeric -> int half AWAY
      val r = n match {
        case dec: Decimal =>
          dec.toJavaBigDecimal.setScale(0, java.math.RoundingMode.HALF_UP).longValue
        case num: java.lang.Number => math.rint(num.doubleValue).toLong
        case o => math.rint(o.toString.toDouble).toLong
      }
      t match {
        case LongType => r
        case _ =>
          if (r > Int.MaxValue || r < Int.MinValue)
            throw new IllegalArgumentException("integer out of range")
          r.toInt
      }
    case (n, f, t) if f == t => n
    case (n, f, t) => widenVal(n, f, t)
  }

  private[functions] def isFloating(t: DataType): Boolean =
    t == DoubleType || t == FloatType || t.isInstanceOf[DecimalType]
  private[functions] def isIntegral(t: DataType): Boolean =
    t == IntegerType || t == LongType || t == ShortType

  /** Whether casting `from` to `to` (both arrays) crosses a floating ->
    * integral element boundary anywhere. */
  def crossesFloatToInt(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ArrayType(f, _), ArrayType(t, _)) => crossesFloatToInt(f, t)
    case (f, t) => isFloating(f) && isIntegral(t)
  }

  /** Array cast with pg rounding semantics on floating -> integral. */
  case class MzListRoundCast(child: Expression, to: DataType)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = to
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else roundConvert(v, child.dataType, to)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `list_remove(list, elem)` — drop elements equal to `elem` (null-safe
    * equality), with mz's numeric promotion; keeps list identity. */
  case class MzListRemove(list: Expression, elem: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(list, elem)
    private lazy val listElem: DataType = list.dataType match {
      case ArrayType(e, _) => e
      case _ => NullType
    }
    private lazy val elemT: DataType = widerOf(listElem, elem.dataType)
    override lazy val dataType: DataType = ArrayType(elemT)
    override def nullable: Boolean = true
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = list.eval(input)
      if (l == null) return null
      val e = widenVal(elem.eval(input), elem.dataType, elemT)
      val kept = elems(l.asInstanceOf[ArrayData], listElem, elemT)
        .filterNot(v => (v == null && e == null) || (v != null && v == e))
      new GenericArrayData(kept)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(list = newChildren(0), elem = newChildren(1))
  }

  /** Identity marker around a LIST constructor so pg_typeof can report
    * `T list` rather than `T[]` — the VALUE representation is the same
    * Spark array. */
  case class MzListTag(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def foldable: Boolean = child.foldable
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `mz_list_cast(x, 'int', depth)` — a list-typed cast that keeps the
    * list identity for pg_typeof (`NULL::INT LIST`, `LIST[]::INT LIST`). */
  case class MzListCast(child: Expression, typeName: Expression, depthExpr: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(child, typeName, depthExpr)
    private lazy val depth: Int = depthExpr.eval(null).toString.toInt
    override lazy val dataType: DataType =
      (1 to depth).foldLeft(scalarType(typeName.eval(null).toString))(
        (t, _) => ArrayType(t))
    override def nullable: Boolean = true
    @transient private lazy val cast =
      org.apache.spark.sql.catalyst.expressions.Cast(child, dataType, Some("UTC"))
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      cast.eval(input)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0), typeName = newChildren(1), depthExpr = newChildren(2))
  }

  /** mz list subscripting: one index per nesting level applied
    * successively (a list-of-lists indexed once yields the sublist —
    * unlike pg arrays, where under-indexing is NULL), 1-based, fractional
    * indexes round half-away-from-zero, out-of-bounds (or out-of-int-
    * range) yields NULL. */
  case class MzListSubscript(children: Seq[Expression])
      extends Expression with CodegenFallback {
    private def list = children.head
    private def idxs = children.tail
    private def peel(dt: DataType, n: Int): DataType =
      if (n == 0) dt else dt match {
        case ArrayType(e, _) => peel(e, n - 1)
        case other => other
      }
    override def dataType: DataType = peel(list.dataType, idxs.length)
    override def nullable: Boolean = true
    private def depthOf(dt: DataType): Int = dt match {
      case ArrayType(e, _) => 1 + depthOf(e)
      case _ => 0
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (!list.dataType.isInstanceOf[ArrayType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cannot subscript type ${list.dataType.simpleString}")
      else if (idxs.length > depthOf(list.dataType)) {
        // the reference: indexing past the deepest layer is a plan error
        // ("cannot index into N layers; list only has M layer[s]",
        // src/sql/src/plan/query.rs plan_subscript_list)
        val n = depthOf(list.dataType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cannot index into ${idxs.length} layers; list only has " +
            s"$n layer${if (n == 1) "" else "s"}")
      }
      else idxs.find(ix => !(ix.dataType.isInstanceOf[NumericType] ||
          ix.dataType == NullType)) match {
        case Some(ix) =>
          // the reference: list subscripts must be integers
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cannot subscript list with type ${ix.dataType.simpleString}")
        case None =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      var cur = list.eval(input)
      var dt = list.dataType
      idxs.foreach { ie =>
        if (cur == null) return null
        val et = dt match {
          case ArrayType(e, _) => e
          case _ => return null
        }
        val raw = ie.eval(input)
        if (raw == null) return null
        val rounded: Long = raw match {
          case dec: Decimal =>
            dec.toJavaBigDecimal.setScale(0, java.math.RoundingMode.HALF_UP).longValue
          case b: java.lang.Long => b.longValue
          case n: java.lang.Number if isFloating(ie.dataType) =>
            math.rint(n.doubleValue).toLong
          case n: java.lang.Number => n.longValue
          case o => try math.rint(o.toString.toDouble).toLong
            catch { case _: Throwable => return null }
        }
        if (rounded > Int.MaxValue || rounded < Int.MinValue) return null
        val i = rounded.toInt
        val a = cur.asInstanceOf[ArrayData]
        if (i < 1 || i > a.numElements()) return null
        cur = if (a.isNullAt(i - 1)) null else a.get(i - 1, et)
        dt = et
      }
      cur
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** mz list slice `l[lo:hi]` (reference list slicing,
    * `doc/user/content/sql/types/list.md` slice syntax): 1-based INCLUSIVE
    * bounds; an absent bound (NULL here — the rewrite spells `[2:]` as
    * `(l, 2, NULL)`) means the list edge; bounds clamp to the list, and a
    * start past the end yields the EMPTY list (never NULL). The result
    * keeps the list's own type — repeated slices re-slice the same level. */
  case class MzListSlice(list: Expression, lo: Expression, hi: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(list, lo, hi)
    override def dataType: DataType = list.dataType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (!list.dataType.isInstanceOf[ArrayType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cannot slice type ${list.dataType.simpleString}")
      else Seq(lo, hi).find(b => !(b.dataType.isInstanceOf[NumericType] ||
          b.dataType == NullType)) match {
        case Some(b) =>
          // the reference: slice bounds must be integers
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cannot slice list with bound of type ${b.dataType.simpleString}")
        case None =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = list.eval(input)
      if (l == null) return null
      val a = l.asInstanceOf[ArrayData]
      val n = a.numElements().toLong
      def bound(e: Expression): Option[Long] = e.eval(input) match {
        case null => None
        case d: Decimal => Some(d.toLong)
        case num: java.lang.Number => Some(num.longValue)
        case o => Some(o.toString.toDouble.toLong)
      }
      // an explicit NULL bound yields NULL (the rewrite encodes an ABSENT
      // bound as a clamped extreme, never as NULL)
      val loB = bound(lo).getOrElse(return null)
      val hiB = bound(hi).getOrElse(return null)
      val loV = math.max(1L, loB)
      val hiV = math.min(n, hiB)
      if (loV > hiV) return new GenericArrayData(Array.empty[Any])
      val et = list.dataType.asInstanceOf[ArrayType].elementType
      new GenericArrayData((loV.toInt to hiV.toInt).map(i =>
        if (a.isNullAt(i - 1)) null else a.get(i - 1, et)).toArray)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(list = newChildren(0), lo = newChildren(1), hi = newChildren(2))
  }

  /** Slice over a non-list operand: the reference rejects it at planning
    * ("array subscript does not support slices",
    * src/sql/src/plan/query.rs extract_scalar_subscript_from_positions) —
    * lists are the ONLY sliceable type. Fails at ANALYSIS (not eval) so
    * zero-row inputs still raise, matching the plan-time rejection. */
  case class MzSliceReject(operand: Expression, lo: Expression, hi: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(operand, lo, hi)
    override def dataType: DataType = operand.dataType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "array subscript does not support slices")
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      throw new UnsupportedOperationException(
        "array subscript does not support slices")
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(operand = newChildren(0), lo = newChildren(1), hi = newChildren(2))
  }

  /** `list_n_layers(list)` — static nesting depth of the list type
    * (reference list_n_layers, src/expr/src/scalar/func.rs). */
  case class MzListNLayers(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    private def depthOf(dt: DataType): Int = dt match {
      case ArrayType(e, _) => 1 + depthOf(e)
      case _ => 0
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (!child.dataType.isInstanceOf[ArrayType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"list_n_layers expects a list, got ${child.dataType.simpleString}")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      depthOf(child.dataType)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("mz_list_in"), info("mz_list_in"),
        (a: Seq[Expression]) => MzListIn(a(0), a(1), a(2))),
      (FunctionIdentifier("mz_list_out"), info("mz_list_out"),
        (a: Seq[Expression]) => MzListOut(a.head)),
      (FunctionIdentifier("list_length_max"), info("list_length_max"),
        (a: Seq[Expression]) => MzListLengthMax(a(0), a(1))),
      (FunctionIdentifier("mz_list_append"), info("mz_list_append"),
        (a: Seq[Expression]) => MzListAppend(a(0), a(1), prepend = false)),
      (FunctionIdentifier("mz_list_prepend"), info("mz_list_prepend"),
        (a: Seq[Expression]) => MzListAppend(a(1), a(0), prepend = true)),
      (FunctionIdentifier("mz_list_cat"), info("mz_list_cat"),
        (a: Seq[Expression]) => MzListCat(a(0), a(1))),
      (FunctionIdentifier("mz_list_tag"), info("mz_list_tag"),
        (a: Seq[Expression]) => MzListTag(a.head)),
      (FunctionIdentifier("mz_list_cast"), info("mz_list_cast"),
        (a: Seq[Expression]) => MzListCast(a(0), a(1), a(2))),
      (FunctionIdentifier("mz_list_subscript"), info("mz_list_subscript"),
        (a: Seq[Expression]) => MzListSubscript(a)),
      (FunctionIdentifier("mz_list_slice"), info("mz_list_slice"),
        (a: Seq[Expression]) => MzListSlice(a(0), a(1), a(2))),
      (FunctionIdentifier("mz_slice_reject"), info("mz_slice_reject"),
        (a: Seq[Expression]) => MzSliceReject(a(0), a(1), a(2))),
      (FunctionIdentifier("mz_list_remove"), info("mz_list_remove"),
        (a: Seq[Expression]) => MzListRemove(a(0), a(1))),
      (FunctionIdentifier("list_n_layers"), info("list_n_layers"),
        (a: Seq[Expression]) => MzListNLayers(a.head)))
}
