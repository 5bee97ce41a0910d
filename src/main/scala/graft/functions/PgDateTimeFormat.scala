package graft.functions

import java.time.{LocalDate, LocalDateTime}
import java.time.temporal.IsoFields

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg `to_char(timestamp, format)` template rendering (reference
  * `src/expr/src/scalar/func/format.rs` DateTimeFormat; pg
  * functions-formatting). The format string is tokenized leftmost-longest
  * over the pg field specifiers; unmatched characters are literals; `"`
  * quotes a literal run (`\"` is an escaped quote inside it); `FM`
  * suppresses padding of the immediately following field; `TH`/`th`
  * directly after a numeric field appends an ordinal suffix.
  *
  * Compiled formats cache per format text, so the common constant-format
  * call compiles once per executor. Rendering is a plain Scala fold over
  * the compiled nodes — no regex work per row.
  */
object PgDateTimeFormat {

  private[functions] sealed trait Node
  private[functions] final case class Lit(s: String) extends Node
  /** ordinal: 0 none, 1 lowercase ("th"), 2 uppercase ("TH"). */
  private[functions] final case class Field(key: String, fill: Boolean, ordinal: Int) extends Node

  /** Format patterns -> field key. Mirrors the reference token table
    * (format.rs:30-247); `fm`/`fx`/`th`/`TH` and the quote tokens are
    * handled structurally in compile. */
  private val fieldTokens: Seq[(String, String)] = Seq(
    "A.D." -> "era_dc", "a.d." -> "era_d", "AD" -> "era_c", "ad" -> "era",
    "B.C." -> "era_dc", "b.c." -> "era_d", "BC" -> "era_c", "bc" -> "era",
    "A.M." -> "mer_dc", "a.m." -> "mer_d", "AM" -> "mer_c", "am" -> "mer",
    "P.M." -> "mer_dc", "p.m." -> "mer_d", "PM" -> "mer_c", "pm" -> "mer",
    "CC" -> "century", "cc" -> "century",
    "DAY" -> "dayname_AC", "Day" -> "dayname_FC", "day" -> "dayname_NC",
    "DY" -> "dyname_AC", "Dy" -> "dyname_FC", "dy" -> "dyname_NC",
    "DDD" -> "doy", "ddd" -> "doy", "DD" -> "dom", "dd" -> "dom",
    "D" -> "dow", "d" -> "dow",
    "HH24" -> "h24", "hh24" -> "h24", "HH12" -> "h12", "hh12" -> "h12",
    "HH" -> "h12", "hh" -> "h12",
    "IDDD" -> "isodoy", "iddd" -> "isodoy", "ID" -> "isodow", "id" -> "isodow",
    "IW" -> "isoweek", "iw" -> "isoweek",
    "IYYY" -> "isoy4", "iyyy" -> "isoy4", "IYY" -> "isoy3", "iyy" -> "isoy3",
    "IY" -> "isoy2", "iy" -> "isoy2", "I" -> "isoy1", "i" -> "isoy1",
    "J" -> "julian", "j" -> "julian",
    "MI" -> "minute", "mi" -> "minute",
    "MONTH" -> "monthname_AC", "Month" -> "monthname_FC", "month" -> "monthname_NC",
    "MON" -> "monname_AC", "Mon" -> "monname_FC", "mon" -> "monname_NC",
    "MM" -> "month2", "mm" -> "month2",
    "MS" -> "ms", "ms" -> "ms",
    "OF" -> "tzoffset",
    "Q" -> "quarter", "q" -> "quarter",
    "RM" -> "roman_c", "rm" -> "roman",
    "SSSSS" -> "spm", "sssss" -> "spm", "SSSS" -> "spm", "ssss" -> "spm",
    "SS" -> "second", "ss" -> "second",
    "TZH" -> "tzh", "TZM" -> "tzm", "TZ" -> "tz_c", "tz" -> "tz",
    "US" -> "us", "us" -> "us",
    "WW" -> "woy", "ww" -> "woy", "W" -> "wom", "w" -> "wom",
    "Y,YYY" -> "y4sep", "y,yyy" -> "y4sep",
    "YYYY" -> "y4", "yyyy" -> "y4", "YYY" -> "y3", "yyy" -> "y3",
    "YY" -> "y2", "yy" -> "y2", "Y" -> "y1", "y" -> "y1")

  private val structuralTokens: Seq[String] =
    Seq("\\\"", "\"", "FM", "fm", "FX", "fx", "TH", "th")

  /** All token patterns, longest-first so the per-position scan picks the
    * longest match (= the reference's LeftmostLongest automaton). */
  private val allTokens: Seq[String] =
    (fieldTokens.map(_._1) ++ structuralTokens).sortBy(-_.length)
  private val fieldKey: Map[String, String] = fieldTokens.toMap

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Vector[Node]]

  private[functions] def compile(s: String): Vector[Node] =
    cache.getOrElseUpdate(s, {
      val out = Vector.newBuilder[Node]
      var inQuotes = false
      var i = 0
      var prevTokEnd = -1
      var prevTokFm = false
      // one-pass scan; a pending Field may still receive a TH/th suffix
      var pending: Option[Field] = null.asInstanceOf[Option[Field]]
      pending = None
      def flushPending(): Unit = { pending.foreach(out += _); pending = None }
      while (i < s.length) {
        val tok = allTokens.find(t => s.regionMatches(false, i, t, 0, t.length))
        tok match {
          case None =>
            flushPending()
            val c = s.charAt(i)
            if (!(inQuotes && c == '\\')) out += Lit(c.toString)
            prevTokEnd = -1; prevTokFm = false
            i += 1
          case Some(t) =>
            val adjacent = prevTokEnd == i
            if (inQuotes) {
              flushPending()
              // tokens inside quotes render literally; quote closes the run
              if (t == "\"") inQuotes = false
              else if (t == "\\\"") out += Lit("\"")
              else out += Lit(t)
              prevTokEnd = i + t.length; prevTokFm = false
            } else t match {
              case "\"" =>
                flushPending(); inQuotes = true
                prevTokEnd = i + t.length; prevTokFm = false
              case "\\\"" =>
                // outside quotes an escaped quote is consumed silently and
                // does NOT toggle quoting (format.rs compile: EscQuote has
                // no field and only Quote flips in_quotes)
                flushPending()
                prevTokEnd = i + t.length; prevTokFm = false
              case "FM" | "fm" =>
                flushPending()
                prevTokEnd = i + t.length; prevTokFm = true
              case "FX" | "fx" =>
                flushPending()
                prevTokEnd = i + t.length; prevTokFm = false
              case "TH" | "th" =>
                pending match {
                  case Some(f) if adjacent =>
                    out += f.copy(ordinal = if (t == "TH") 2 else 1)
                    pending = None
                  case _ => flushPending() // stray th disappears (format.rs)
                }
                prevTokEnd = i + t.length; prevTokFm = false
              case _ =>
                flushPending()
                val fill = !(adjacent && prevTokFm)
                pending = Some(Field(fieldKey(t), fill, 0))
                prevTokEnd = i + t.length; prevTokFm = false
            }
            i += t.length
        }
      }
      flushPending()
      out.result()
    })

  private val weekdaysNC = Array("sunday", "monday", "tuesday", "wednesday",
    "thursday", "friday", "saturday")
  private val monthsNC = Array("january", "february", "march", "april", "may",
    "june", "july", "august", "september", "october", "november", "december")
  private val monthsAbbrevNC = Array("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")
  private val romanNC = Array("i", "ii", "iii", "iv", "v", "vi", "vii", "viii",
    "ix", "x", "xi", "xii")

  private def caps(s: String, mode: Char): String = mode match {
    case 'A' => s.toUpperCase
    case 'F' => s.capitalize
    case _ => s
  }

  private def ordinalSuffix(n: Long, mode: Int): String = {
    val d = (n % 100) match { case t if t >= 10 && t <= 19 => 0L; case _ => n % 10 }
    val s = d match { case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th" }
    if (mode == 2) s.toUpperCase else s
  }

  /** Render one timestamp. `tzUtc=true` renders timezone fields as a UTC
    * timestamptz does (name "UTC"); false as a naive timestamp (name ""). */
  private[functions] def render(fmt: String, ts: LocalDateTime, tzUtc: Boolean): String = {
    val sb = new StringBuilder
    val yearCePositive = ts.getYear > 0
    val yearCe: Long = if (yearCePositive) ts.getYear.toLong else 1L - ts.getYear
    val wby = ts.get(IsoFields.WEEK_BASED_YEAR)
    val isoYearCe: Long = if (wby > 0) wby.toLong else 1L - wby
    val hour = ts.getHour
    val pm = hour >= 12
    val h12 = { val h = hour % 12; if (h == 0) 12 else h }
    val dowSun1 = ts.getDayOfWeek.getValue % 7 + 1 // Sunday=1..Saturday=7
    val weekday0 = ts.getDayOfWeek.getValue % 7 // Sunday=0

    def num(n: Long, width: Int, fill: Boolean, ord: Int): Unit = {
      sb.append(if (fill && width > 0) s"%0${width}d".format(n) else n.toString)
      if (ord != 0) sb.append(ordinalSuffix(n, ord))
    }
    def str(s: String, width: Int, fill: Boolean): Unit =
      sb.append(if (fill && width > 0) s"%-${width}s".format(s) else s)

    compile(fmt).foreach {
      case Lit(s) => sb.append(s)
      case Field(key, fill, ord) => key match {
        case "era_dc" => str(if (yearCePositive) "A.D." else "B.C.", 0, fill)
        case "era_d" => str(if (yearCePositive) "a.d." else "b.c.", 0, fill)
        case "era_c" => str(if (yearCePositive) "AD" else "BC", 0, fill)
        case "era" => str(if (yearCePositive) "ad" else "bc", 0, fill)
        case "mer_dc" => str(if (pm) "P.M." else "A.M.", 0, fill)
        case "mer_d" => str(if (pm) "p.m." else "a.m.", 0, fill)
        case "mer_c" => str(if (pm) "PM" else "AM", 0, fill)
        case "mer" => str(if (pm) "pm" else "am", 0, fill)
        case "century" =>
          val y = ts.getYear
          val n = if (y > 0) (y - 1) / 100 + 1 else y / 100 - 1
          num(n.toLong, if (n >= 0) 2 else 3, fill, ord)
        case "dow" => num(dowSun1.toLong, 1, fill, ord)
        case "isodow" => num(ts.getDayOfWeek.getValue.toLong, 1, fill, ord)
        case "dayname_AC" => str(caps(weekdaysNC(weekday0), 'A'), 9, fill)
        case "dayname_FC" => str(caps(weekdaysNC(weekday0), 'F'), 9, fill)
        case "dayname_NC" => str(weekdaysNC(weekday0), 9, fill)
        case "dyname_AC" => str(caps(weekdaysNC(weekday0).take(3), 'A'), 0, fill)
        case "dyname_FC" => str(caps(weekdaysNC(weekday0).take(3), 'F'), 0, fill)
        case "dyname_NC" => str(weekdaysNC(weekday0).take(3), 0, fill)
        case "dom" => num(ts.getDayOfMonth.toLong, 2, fill, ord)
        case "doy" => num(ts.getDayOfYear.toLong, 3, fill, ord)
        case "h12" => num(h12.toLong, 2, fill, ord)
        case "h24" => num(hour.toLong, 2, fill, ord)
        case "isoy1" => num(isoYearCe % 10, 1, fill, ord)
        case "isoy2" => num(isoYearCe % 100, 2, fill, ord)
        case "isoy3" => num(isoYearCe % 1000, 3, fill, ord)
        case "isoy4" => num(isoYearCe, 4, fill, ord)
        case "isodoy" =>
          val week0 = ts.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR) - 1
          num(week0.toLong * 7 + ts.getDayOfWeek.getValue, 3, fill, ord)
        case "isoweek" =>
          num(ts.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong, 2, fill, ord)
        case "julian" => num(ts.toLocalDate.toEpochDay + 2440588L, 0, fill, ord)
        case "minute" => num(ts.getMinute.toLong, 2, fill, ord)
        case "month2" => num(ts.getMonthValue.toLong, 2, fill, ord)
        case "monthname_AC" => str(caps(monthsNC(ts.getMonthValue - 1), 'A'), 9, fill)
        case "monthname_FC" => str(caps(monthsNC(ts.getMonthValue - 1), 'F'), 9, fill)
        case "monthname_NC" => str(monthsNC(ts.getMonthValue - 1), 9, fill)
        case "monname_AC" => str(caps(monthsAbbrevNC(ts.getMonthValue - 1), 'A'), 0, fill)
        case "monname_FC" => str(caps(monthsAbbrevNC(ts.getMonthValue - 1), 'F'), 0, fill)
        case "monname_NC" => str(monthsAbbrevNC(ts.getMonthValue - 1), 0, fill)
        case "ms" => num(ts.getNano.toLong / 1000000L, 3, fill, ord)
        case "quarter" => num((ts.getMonthValue - 1).toLong / 3 + 1, 0, fill, ord)
        case "roman_c" => str(romanNC(ts.getMonthValue - 1).toUpperCase, 4, fill)
        case "roman" => str(romanNC(ts.getMonthValue - 1), 4, fill)
        case "second" => num(ts.getSecond.toLong, 2, fill, ord)
        case "spm" => num(ts.toLocalTime.toSecondOfDay.toLong, 0, fill, ord)
        case "tz_c" => str(if (tzUtc) "UTC" else "", 0, fill)
        case "tz" => str(if (tzUtc) "utc" else "", 0, fill)
        case "tzh" => str("+00", 0, fill)
        case "tzm" => str("00", 0, fill)
        case "tzoffset" => str("+00", 0, fill)
        case "us" => num(ts.getNano.toLong / 1000L, 6, fill, ord)
        case "wom" => num((ts.getDayOfMonth - 1).toLong / 7 + 1, 1, fill, ord)
        case "woy" => num((ts.getDayOfYear - 1).toLong / 7 + 1, 2, fill, ord)
        case "y1" => num(yearCe % 10, 1, fill, ord)
        case "y2" => num(yearCe % 100, 2, fill, ord)
        case "y3" => num(yearCe % 1000, 3, fill, ord)
        case "y4" => num(yearCe, 4, fill, ord)
        case "y4sep" =>
          sb.append(s"${yearCe / 1000},${"%03d".format(yearCe % 1000)}")
          if (ord != 0) sb.append(ordinalSuffix(yearCe, ord))
      }
    }
    sb.toString
  }

  /** `pg_to_char(ts, format)`; `tzUtc` selects timestamptz rendering of the
    * timezone fields (reference TimestampLike impls, adt/timestamp.rs). */
  case class PgToChar(children: Seq[Expression], tzUtc: Boolean)
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val tsv = children(0).eval(input)
      val fmtv = children(1).eval(input)
      if (tsv == null || fmtv == null) return null
      val ts = children(0).dataType match {
        case DateType =>
          LocalDate.ofEpochDay(tsv.asInstanceOf[Int].toLong).atStartOfDay()
        case _ =>
          val micros = tsv.asInstanceOf[Long]
          val secs = Math.floorDiv(micros, 1000000L)
          val nanos = Math.floorMod(micros, 1000000L) * 1000L
          LocalDateTime.ofEpochSecond(secs, nanos.toInt, java.time.ZoneOffset.UTC)
      }
      UTF8String.fromString(render(fmtv.toString, ts, tzUtc))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_to_char"),
      new ExpressionInfo(getClass.getName, "pg_to_char"),
      (args: Seq[Expression]) =>
        if (args.length == 2) PgToChar(args, tzUtc = false)
        else throw new IllegalArgumentException(
          s"pg_to_char expects (timestamp, format), got ${args.length}")),
    (new FunctionIdentifier("pg_to_char_tz"),
      new ExpressionInfo(getClass.getName, "pg_to_char_tz"),
      (args: Seq[Expression]) =>
        if (args.length == 2) PgToChar(args, tzUtc = true)
        else throw new IllegalArgumentException(
          s"pg_to_char_tz expects (timestamptz, format), got ${args.length}")))
}
