package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pg/reference RANGE types over canonical-text values (reference
  * `SqlScalarType::Range`, `src/repr/src/scalar.rs:1753-1755`; model and
  * canonicalization `src/repr/src/adt/range.rs`; operators
  * `src/expr/src/scalar/func/impls/range.rs`).
  *
  * Spark has no range type; the engine's convention (mirroring the jsonb
  * family) is pg's canonical TEXT rendering: `empty`, `[0,100)`,
  * `(,"1970-01-01 00:00:00")`. Casting parses + canonicalizes per element
  * type — discrete ranges (int4/int8/date) normalize to `[lo,hi)` by
  * stepping exclusive lowers / inclusive uppers, continuous ranges
  * (num/ts/tstz) keep their bound flags — so equality and ordering on the
  * rendered text line up with pg's range semantics, and operators re-parse
  * canonical text without needing the element type (canonical discrete
  * bounds are always `[`/`)`, which makes union/difference/adjacency pure
  * bound algebra).
  *
  * All expressions are CodegenFallback, like jsonb: this family exists for
  * pg-dialect fidelity, not for measured hot paths. */
object PgRangeValue {

  /** A range as canonical bound text. Infinite bounds are None and always
    * exclusive (pg renders `[,1)` as `(,1)`). */
  final case class Rng(empty: Boolean, lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean)

  val EmptyRng: Rng = Rng(empty = true, None, loInc = false, None, hiInc = false)

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def invalid(text: String): Nothing =
    err(s"""invalid input syntax for type range: "$text"""")

  private def discrete(kind: String): Boolean =
    kind == "int4range" || kind == "int8range" || kind == "daterange"

  // ---- element text: parse / canonical render / successor ------------------

  private def renderNum(d: JBigDecimal): String = {
    val s = d.stripTrailingZeros
    (if (s.scale < 0) s.setScale(0) else s).toPlainString
  }

  private def parseDate(raw: String): LocalDate = {
    val m = """^(\d{1,6})-(\d{1,2})-(\d{1,2})$""".r.findFirstMatchIn(raw)
      .getOrElse(invalid(raw))
    LocalDate.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
  }

  private def renderDate(d: LocalDate): String =
    f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"

  private def parseTs(raw: String): LocalDateTime = {
    // unanchored: mz's timestamp input routine tolerates surrounding junk
    // in quoted range bounds (range.slt expects '"?!?2024-02-13 …!?!"' to
    // parse as the embedded timestamp)
    val m = """(\d{1,6})-(\d{1,2})-(\d{1,2})[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(\.\d+)?)?"""
      .r.findFirstMatchIn(raw).getOrElse(invalid(raw))
    val nanos = Option(m.group(7)).map(f => (BigDecimal(f) * 1e9).toLong).getOrElse(0L)
    LocalDateTime.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
      m.group(4).toInt, m.group(5).toInt,
      Option(m.group(6)).map(_.toInt).getOrElse(0), nanos.toInt)
  }

  private def renderTs(t: LocalDateTime): String = {
    val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    if (t.getNano == 0) base
    else base + ("." + f"${t.getNano}%09d").reverse.dropWhile(_ == '0').reverse
  }

  /** tstz input: optional trailing offset (`+00`, `-05:30`, `Z`) shifts to
    * UTC; canonical rendering appends `+00`. */
  private def parseTstz(raw: String): LocalDateTime = {
    val m = """^(.*?)\s*(Z|[+-]\d{1,2}(?::?\d{2})?)?$""".r.findFirstMatchIn(raw).get
    val local = parseTs(m.group(1))
    Option(m.group(2)).filter(_ != null) match {
      case Some("Z") | None => local
      case Some(off) =>
        val sign = if (off.head == '-') -1 else 1
        val digits = off.tail.replace(":", "")
        val (h, min) =
          if (digits.length <= 2) (digits.toInt, 0)
          else (digits.take(digits.length - 2).toInt, digits.takeRight(2).toInt)
        local.minusSeconds(sign * (h * 3600L + min * 60L))
    }
  }

  /** Parse + canonically render one bound per kind; throws pg-style errors
    * on garbage or out-of-domain values. */
  def canonElem(kind: String, raw0: String): String = {
    val raw = raw0.trim.stripPrefix("\"").stripSuffix("\"").trim
    if (raw.isEmpty) invalid(raw0)
    try kind match {
      case "int4range" =>
        if (!raw.matches("[+-]?\\d+")) invalid(raw)
        val v = BigInt(raw)
        if (v < Int.MinValue || v > Int.MaxValue) err("integer out of range")
        v.toString
      case "int8range" =>
        if (!raw.matches("[+-]?\\d+")) invalid(raw)
        val v = BigInt(raw)
        if (v < Long.MinValue || v > Long.MaxValue) err("bigint out of range")
        v.toString
      case "numrange" => renderNum(new JBigDecimal(raw))
      case "daterange" => renderDate(parseDate(raw))
      case "tsrange" => renderTs(parseTs(raw))
      case "tstzrange" => renderTs(parseTstz(raw)) + "+00"
      case other => err(s"range type over $other is not supported")
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
        (e.getMessage.contains("out of range") || e.getMessage.contains("invalid input") ||
          e.getMessage.contains("not supported")) => throw e
      case _: Exception => invalid(raw0)
    }
  }

  /** Successor of a discrete element (canonicalization step). */
  private def succ(kind: String, v: String): String = kind match {
    case "int4range" =>
      val n = v.toLong + 1
      if (n > Int.MaxValue) err("integer out of range")
      n.toString
    case "int8range" =>
      val n = BigInt(v) + 1
      if (n > Long.MaxValue) err("bigint out of range")
      n.toString
    case "daterange" => renderDate(parseDate(v).plusDays(1))
    case _ => v
  }

  // ---- element + bound comparison ------------------------------------------

  /** Compare canonical bound texts without knowing the kind: temporal texts
    * (leading `yyyy…-mm-dd`) compare by numeric year then lexically (the
    * canonical zero-padded rendering makes the remainder order-correct);
    * everything else compares as a number. */
  def cmpElem(a: String, b: String): Int = {
    val tempA = a.length > 4 && a.charAt(0).isDigit && a.contains("-")
    val tempB = b.length > 4 && b.charAt(0).isDigit && b.contains("-")
    if (tempA && tempB) {
      val ya = a.takeWhile(_ != '-'); val yb = b.takeWhile(_ != '-')
      val c = java.lang.Long.compare(ya.toLong, yb.toLong)
      if (c != 0) c else a.substring(ya.length).compareTo(b.substring(yb.length))
    } else new JBigDecimal(a).compareTo(new JBigDecimal(b))
  }

  /** pg bound order for lowers: -inf first; same value, inclusive first. */
  def cmpLower(a: Rng, b: Rng): Int = (a.lo, b.lo) match {
    case (None, None) => 0
    case (None, _) => -1
    case (_, None) => 1
    case (Some(x), Some(y)) =>
      val c = cmpElem(x, y)
      if (c != 0) c
      else (a.loInc, b.loInc) match {
        case (true, false) => -1; case (false, true) => 1; case _ => 0
      }
  }

  /** pg bound order for uppers: +inf last; same value, exclusive first. */
  def cmpUpper(a: Rng, b: Rng): Int = (a.hi, b.hi) match {
    case (None, None) => 0
    case (None, _) => 1
    case (_, None) => -1
    case (Some(x), Some(y)) =>
      val c = cmpElem(x, y)
      if (c != 0) c
      else (a.hiInc, b.hiInc) match {
        case (true, false) => 1; case (false, true) => -1; case _ => 0
      }
  }

  /** pg range_cmp: empty sorts first; then lower bound, then upper. */
  def rangeCmp(a: Rng, b: Rng): Int =
    if (a.empty && b.empty) 0
    else if (a.empty) -1
    else if (b.empty) 1
    else {
      val c = cmpLower(a, b)
      if (c != 0) c else cmpUpper(a, b)
    }

  // ---- construction / canonicalization -------------------------------------

  /** Emptiness/validity normalization of already-canonical bounds. */
  private def normalize(lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean): Rng =
    (lo, hi) match {
      case (Some(a), Some(b)) =>
        val c = cmpElem(a, b)
        if (c > 0) EmptyRng
        else if (c == 0 && !(loInc && hiInc)) EmptyRng
        else Rng(empty = false, lo, loInc, hi, hiInc)
      case _ => Rng(empty = false, lo, loInc && lo.isDefined, hi, hiInc && hi.isDefined)
    }

  /** Canonicalize parsed bounds per kind: pg checks lo <= hi on the INPUT
    * values, then steps discrete bounds to `[lo,hi)` form (overflow errors
    * surface here), then collapses lo >= hi to empty. */
  def canonicalize(kind: String, lo0: Option[String], loInc0: Boolean,
      hi0: Option[String], hiInc0: Boolean): Rng = {
    for (a <- lo0; b <- hi0)
      if (cmpElem(a, b) > 0)
        err("range lower bound must be less than or equal to range upper bound")
    var (lo, loInc, hi, hiInc) = (lo0, loInc0 && lo0.isDefined,
      hi0, hiInc0 && hi0.isDefined)
    if (discrete(kind)) {
      if (lo.isDefined && !loInc) { lo = lo.map(succ(kind, _)); loInc = true }
      if (hi.isDefined && hiInc) { hi = hi.map(succ(kind, _)); hiInc = false }
    }
    normalize(lo, loInc, hi, hiInc)
  }

  // ---- text form ------------------------------------------------------------

  private def splitBounds(inner: String): Option[(String, String)] = {
    var depth = 0; var inQ = false; var split = -1; var i = 0
    while (i < inner.length && split < 0) {
      inner.charAt(i) match {
        case '"' => inQ = !inQ
        case ',' if !inQ && depth == 0 => split = i
        case _ => ()
      }
      i += 1
    }
    if (split < 0) None else Some((inner.substring(0, split), inner.substring(split + 1)))
  }

  /** Parse range text. With a kind: full parse + canonicalize (the cast
    * path). Without: structural re-parse of ALREADY-canonical text (the
    * operator path — bounds are compared as-is). */
  def parse(kind: Option[String], text0: String): Rng = {
    val text = text0.trim
    if (text.equalsIgnoreCase("empty")) EmptyRng
    else {
      if (text.length < 3) invalid(text0)
      val lb = text.head; val rb = text.last
      if ((lb != '[' && lb != '(') || (rb != ']' && rb != ')')) invalid(text0)
      val (loRaw, hiRaw) = splitBounds(text.substring(1, text.length - 1))
        .getOrElse(invalid(text0))
      // a truly empty bound is infinite; a whitespace-only bound is a pg
      // input error ('[1, )' rejects, '[1,)' is unbounded)
      def bound(raw: String): Option[String] =
        if (raw.isEmpty) None
        else if (raw.trim.isEmpty) invalid(text0)
        else Some(raw.trim)
      val lo0 = bound(loRaw)
      val hi0 = bound(hiRaw)
      kind match {
        case Some(k) => canonicalize(k, lo0.map(canonElem(k, _)), lb == '[',
          hi0.map(canonElem(k, _)), rb == ']')
        case None => normalize(lo0.map(unquote), lb == '[', hi0.map(unquote), rb == ']')
      }
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
    else s

  def render(r: Rng): String =
    if (r.empty) "empty"
    else {
      def q(s: String): String =
        if (s.exists(c => c == ' ' || c == ',' || c == '"' || c == '(' ||
          c == ')' || c == '[' || c == ']')) "\"" + s + "\"" else s
      (if (r.loInc) "[" else "(") + r.lo.map(q).getOrElse("") + "," +
        r.hi.map(q).getOrElse("") + (if (r.hiInc) "]" else ")")
    }

  // ---- operators (reference src/expr/src/scalar/func/impls/range.rs) -------

  /** a.lower <= b.upper — the half-overlap test. */
  private def lowerLeUpper(a: Rng, b: Rng): Boolean = (a.lo, b.hi) match {
    case (None, _) | (_, None) => true
    case (Some(x), Some(y)) =>
      val c = cmpElem(x, y)
      c < 0 || (c == 0 && a.loInc && b.hiInc)
  }

  def overlaps(a: Rng, b: Rng): Boolean =
    !a.empty && !b.empty && lowerLeUpper(a, b) && lowerLeUpper(b, a)

  /** `-|-`: bounds touch with no gap and no overlap (exactly one side
    * closed at the shared value). */
  def adjacent(a: Rng, b: Rng): Boolean = {
    def touch(hi: Rng, lo: Rng): Boolean = (hi.hi, lo.lo) match {
      case (Some(x), Some(y)) => cmpElem(x, y) == 0 && (hi.hiInc != lo.loInc)
      case _ => false
    }
    !a.empty && !b.empty && (touch(a, b) || touch(b, a))
  }

  def union(a: Rng, b: Rng): Rng =
    if (a.empty) b
    else if (b.empty) a
    else if (!overlaps(a, b) && !adjacent(a, b))
      err("result of range union would not be contiguous")
    else {
      val lo = if (cmpLower(a, b) <= 0) a else b
      val hi = if (cmpUpper(a, b) >= 0) a else b
      Rng(empty = false, lo.lo, lo.loInc, hi.hi, hi.hiInc)
    }

  def intersect(a: Rng, b: Rng): Rng =
    if (a.empty || b.empty || !overlaps(a, b)) EmptyRng
    else {
      val lo = if (cmpLower(a, b) >= 0) a else b
      val hi = if (cmpUpper(a, b) <= 0) a else b
      normalize(lo.lo, lo.loInc, hi.hi, hi.hiInc)
    }

  def minus(a: Rng, b: Rng): Rng =
    if (a.empty || b.empty || !overlaps(a, b)) a
    else {
      val coversLo = cmpLower(b, a) <= 0
      val coversHi = cmpUpper(b, a) >= 0
      if (coversLo && coversHi) EmptyRng
      else if (coversLo) normalize(b.hi, !b.hiInc, a.hi, a.hiInc)
      else if (coversHi) normalize(a.lo, a.loInc, b.lo, !b.loInc)
      else err("result of range difference would not be contiguous")
    }

  def containsElem(r: Rng, e: String): Boolean =
    !r.empty &&
      r.lo.forall(x => { val c = cmpElem(e, x); c > 0 || (c == 0 && r.loInc) }) &&
      r.hi.forall(x => { val c = cmpElem(e, x); c < 0 || (c == 0 && r.hiInc) })

  def containsRange(a: Rng, b: Rng): Boolean =
    b.empty || (!a.empty && cmpLower(a, b) <= 0 && cmpUpper(a, b) >= 0)

  /** `&<`: a does not extend to the right of b (upper <= b's upper). */
  def notExtRight(a: Rng, b: Rng): Boolean =
    !a.empty && !b.empty && cmpUpper(a, b) <= 0

  /** `&>`: a does not extend to the left of b (lower >= b's lower). */
  def notExtLeft(a: Rng, b: Rng): Boolean =
    !a.empty && !b.empty && cmpLower(a, b) >= 0

  /** `<<`: a entirely before b. */
  def before(a: Rng, b: Rng): Boolean =
    !a.empty && !b.empty && ((a.hi, b.lo) match {
      case (Some(x), Some(y)) =>
        val c = cmpElem(x, y)
        c < 0 || (c == 0 && !(a.hiInc && b.loInc))
      case _ => false
    })

  /** Numeric image of a bound for ORDER BY keys (dates → epoch day,
    * timestamps → epoch micros, numbers as themselves). */
  def elemKey(s: String): JBigDecimal =
    if (s.length > 4 && s.charAt(0).isDigit && s.contains("-")) {
      if (s.contains(":")) {
        val t = parseTstz(s) // also parses plain ts (offset optional)
        new JBigDecimal(t.toEpochSecond(ZoneOffset.UTC))
          .multiply(new JBigDecimal(1000000L))
          .add(new JBigDecimal(t.getNano / 1000))
      } else new JBigDecimal(parseDate(s).toEpochDay)
    } else new JBigDecimal(s)
}

// ---- Catalyst expressions ---------------------------------------------------

/** `'text'::<kind>` — parse + canonicalize to canonical range text. */
case class RangeParse(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PgRangeValue.render(
      PgRangeValue.parse(Some(kind), input.toString)))
  override protected def withNewChildInternal(c: Expression): RangeParse = copy(child = c)
}

/** `::_<kind>` — pg array-of-range cast: parses + canonicalizes every
  * element. Accepts an array value (ARRAY[...]::_int4range) or a pg array
  * literal text ('{"(,)","empty"}'::_int4range). */
case class RangeParseArray(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    def canon(s: String): Any =
      if (s == null) null
      else UTF8String.fromString(PgRangeValue.render(PgRangeValue.parse(Some(kind), s)))
    input match {
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        val out = (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) null else canon(arr.getUTF8String(i).toString)
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
      case s =>
        val text = s.toString.trim
        if (!text.startsWith("{") || !text.endsWith("}")) PgRangeValue.invalid(text)
        val inner = text.substring(1, text.length - 1)
        val elems = scala.collection.mutable.ListBuffer.empty[Any]
        var cur = new StringBuilder; var inQ = false
        def flush(): Unit = {
          val raw = cur.toString.trim
          val unq = if (raw.length >= 2 && raw.head == '"' && raw.last == '"')
            raw.substring(1, raw.length - 1) else raw
          elems += (if (raw.isEmpty || unq.equalsIgnoreCase("null")) null else canon(unq))
          cur = new StringBuilder
        }
        if (inner.trim.nonEmpty) {
          inner.foreach {
            case '"' => inQ = !inQ; cur += '"'
            case ',' if !inQ => flush()
            case c => cur += c
          }
          flush()
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(elems.toArray)
    }
  }
  override protected def withNewChildInternal(c: Expression): RangeParseArray = copy(child = c)
}

/** Constructor `int4range(lo, hi[, flags])` etc. — typed bounds, pg flag
  * validation (NULL flags and malformed flag strings error, they do not
  * null-propagate). */
case class RangeMake(children: Seq[Expression], kind: String)
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  private def elemText(e: Expression, v: Any): Option[String] =
    if (v == null) None
    else Some(e.dataType match {
      case _: DecimalType => PgRangeValue.canonElem("numrange",
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString)
      case DateType => PgRangeValue.canonElem("daterange",
        LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case TimestampType | TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        val t = LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
        PgRangeValue.canonElem(kind, t.toLocalDate.toString + " " + t.toLocalTime.toString)
      case ByteType | ShortType | IntegerType | LongType =>
        PgRangeValue.canonElem(kind, v.toString)
      case StringType => PgRangeValue.canonElem(kind, v.toString)
      case FloatType | DoubleType =>
        throw new IllegalArgumentException("range type over real is not supported")
      case other =>
        throw new IllegalArgumentException(s"range type over $other is not supported")
    })

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val flags = if (children.length < 3) "[)" else {
      val f = children(2).eval(input)
      if (f == null)
        throw new IllegalArgumentException(
          "range constructor flags argument must not be null")
      f.toString
    }
    if (!flags.matches("""[\[(][\])]"""))
      throw new IllegalArgumentException(s"""invalid range bound flags: "$flags"""")
    val lo = elemText(children(0), children(0).eval(input))
    val hi = elemText(children(1), children(1).eval(input))
    UTF8String.fromString(PgRangeValue.render(PgRangeValue.canonicalize(
      kind, lo, flags.charAt(0) == '[', hi, flags.charAt(1) == ']')))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RangeMake = copy(children = c)
}

/** Binary range operators over canonical text: set ops return range text,
  * predicates Boolean, `cmp` the pg range ordering as an Int. */
case class RangeBinary(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  import PgRangeValue._
  override def foldable: Boolean = left.foldable && right.foldable
  override def dataType: DataType = op match {
    case "union" | "intersect" | "minus" => StringType
    case "cmp" => IntegerType
    case _ => BooleanType
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = parse(None, l.toString); val b = parse(None, r.toString)
    op match {
      case "union" => UTF8String.fromString(render(union(a, b)))
      case "intersect" => UTF8String.fromString(render(intersect(a, b)))
      case "minus" => UTF8String.fromString(render(minus(a, b)))
      case "cmp" => rangeCmp(a, b)
      case "contains" => containsRange(a, b)
      case "overlaps" => overlaps(a, b)
      case "before" => before(a, b)
      case "after" => before(b, a)
      case "adjacent" => adjacent(a, b)
      case "notextright" => notExtRight(a, b)
      case "notextleft" => notExtLeft(a, b)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RangeBinary =
    copy(left = l, right = r)
}

/** `range @> element` — the element arrives typed; temporal values render
  * to the same canonical text the range bounds carry. `kind`, when the SQL
  * shim knows it statically, enforces pg's operator resolution: discrete
  * int ranges reject fractional/float elements, every range rejects
  * float/double (pg has no `range @> double precision`). */
case class RangeContainsElem(left: Expression, right: Expression,
    kind: Option[String] = None)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def foldable: Boolean = left.foldable && right.foldable
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    kind.foreach { k =>
      val elemTy = right.dataType match {
        case DoubleType | FloatType => "double precision"
        case d: DecimalType if d.scale > 0 => "numeric"
        case _ => ""
      }
      if (elemTy == "double precision" ||
          (elemTy == "numeric" && (k == "int4range" || k == "int8range")))
        throw new IllegalArgumentException(
          s"operator does not exist: $k @> $elemTy")
    }
    val rng = PgRangeValue.parse(None, l.toString)
    val elem = right.dataType match {
      case _: DecimalType =>
        r.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString
      case DateType => LocalDate.ofEpochDay(r.asInstanceOf[Int].toLong).toString
      case TimestampType | TimestampNTZType =>
        val micros = r.asInstanceOf[Long]
        val t = LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
        PgRangeValue.canonElem("tsrange", t.toLocalDate.toString + " " + t.toLocalTime.toString)
      case DoubleType | FloatType =>
        PgRangeValue.canonElem("numrange", new JBigDecimal(r.toString).toPlainString)
      case _ => r.toString
    }
    // tstz bounds carry a +00 suffix the element text lacks
    val bounds = rng.lo.orElse(rng.hi)
    val elemAdj = if (bounds.exists(_.endsWith("+00")) && !elem.endsWith("+00"))
      PgRangeValue.canonElem("tstzrange", elem) else elem
    PgRangeValue.containsElem(rng, elemAdj)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RangeContainsElem =
    copy(left = l, right = r)
}

/** lower / upper / isempty / lower_inc / upper_inc / lower_inf / upper_inf. */
case class RangeAccessor(child: Expression, which: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (which == "lower" || which == "upper") StringType else BooleanType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val r = PgRangeValue.parse(None, input.toString)
    which match {
      case "lower" => r.lo.map(UTF8String.fromString).orNull
      case "upper" => r.hi.map(UTF8String.fromString).orNull
      case "isempty" => r.empty
      case "lower_inc" => !r.empty && r.loInc
      case "upper_inc" => !r.empty && r.hiInc
      case "lower_inf" => !r.empty && r.lo.isEmpty
      case "upper_inf" => !r.empty && r.hi.isEmpty
    }
  }
  override protected def withNewChildInternal(c: Expression): RangeAccessor = copy(child = c)
}

/** Orderable image of a range for ORDER BY: a struct sorting exactly like
  * pg's range order (empty first; -inf lowers first; inclusive lower before
  * exclusive at the same value; uppers with +inf last, exclusive first). */
case class RangeSortKey(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val dec = DecimalType(38, 6)
  override def dataType: DataType = StructType(Seq(
    StructField("nonempty", IntegerType, nullable = false),
    StructField("lo_fin", IntegerType, nullable = false),
    StructField("lo", dec, nullable = false),
    StructField("lo_exc", IntegerType, nullable = false),
    StructField("hi_inf", IntegerType, nullable = false),
    StructField("hi", dec, nullable = false),
    StructField("hi_exc", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    import PgRangeValue._
    val r = parse(None, input.toString)
    def d(s: Option[String]): org.apache.spark.sql.types.Decimal =
      org.apache.spark.sql.types.Decimal(
        s.map(elemKey).getOrElse(JBigDecimal.ZERO), 38, 6)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (r.empty) 0 else 1,
      if (r.empty || r.lo.isEmpty) 0 else 1,
      d(r.lo),
      if (!r.empty && r.lo.isDefined && !r.loInc) 1 else 0,
      if (!r.empty && r.hi.isEmpty) 1 else 0,
      d(r.hi),
      // at the same upper value, exclusive sorts first
      if (!r.empty && r.hi.isDefined && r.hiInc) 1 else 0))
  }
  override protected def withNewChildInternal(c: Expression): RangeSortKey = copy(child = c)
}

object RangeFunctions {
  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  val kinds: Seq[String] =
    Seq("int4range", "int8range", "numrange", "daterange", "tsrange", "tstzrange")

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val casts = kinds.map { k =>
      (s"pg_$k", (a: Seq[Expression]) => RangeParse(a.head, k): Expression)
    }
    val arrCasts = kinds.map { k =>
      (s"pg_arr_$k", (a: Seq[Expression]) => RangeParseArray(a.head, k): Expression)
    }
    val ctors = kinds.map { k =>
      (k, (a: Seq[Expression]) => RangeMake(a, k): Expression)
    }
    val binOps = Seq("union", "intersect", "minus", "cmp", "contains",
      "overlaps", "before", "after", "adjacent", "notextright", "notextleft").map { op =>
      (s"range_$op", (a: Seq[Expression]) => RangeBinary(a(0), a(1), op): Expression)
    }
    val accessors = Seq("isempty", "lower_inc", "upper_inc", "lower_inf", "upper_inf")
      .map { w => (w, (a: Seq[Expression]) => RangeAccessor(a.head, w): Expression) }
    val named = Seq(
      ("range_lower", (a: Seq[Expression]) => RangeAccessor(a.head, "lower"): Expression),
      ("range_upper", (a: Seq[Expression]) => RangeAccessor(a.head, "upper"): Expression),
      // optional 3rd arg: the range kind as a literal, for pg operator
      // resolution (the SQL shim passes it when statically known)
      ("range_contains_elem", (a: Seq[Expression]) => RangeContainsElem(a(0), a(1),
        a.lift(2).collect { case Literal(s, StringType) => s.toString }): Expression),
      ("range_sort_key", (a: Seq[Expression]) => RangeSortKey(a.head): Expression))
    (casts ++ arrCasts ++ ctors ++ binOps ++ accessors ++ named)
      .map { case (n, b) => (FunctionIdentifier(n), info(n), b) }
  }
}
