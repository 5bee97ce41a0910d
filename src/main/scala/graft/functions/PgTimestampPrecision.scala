package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, TimestampType}

/** pg `timestamp(p)` / `timestamptz(p)` precision semantics: pg ROUNDS the
  * fractional seconds to `p` digits (half-up, carrying into whole seconds),
  * where Spark's TIMESTAMP has fixed micro precision and its casts
  * truncate. Two forms:
  *
  *  - `pg_ts_ingest(text, p)` — the column-ingest path (INSERT INTO a
  *    `timestamp(p)` column): parses pg's timestamp input text itself so
  *    loose zone offsets ('+4') and sub-micro fractions round correctly
  *    BEFORE micro truncation can lose the 7th digit.
  *  - `pg_ts_round(ts, p)` — the cast path (`col::timestamp(p)`): rounds an
  *    existing timestamp's micros to `p` fractional digits.
  *
  * Reference: `src/repr/src/adt/timestamp.rs` (CheckedTimestamp::round_to_precision),
  * pg datatype-datetime §8.5.1.
  */
object PgTimestampPrecision {

  /** Round `micros` (epoch micros) to `p` fractional-second digits,
    * half-up away from the floor (matches pg for the AD date range the
    * corpus exercises). */
  def roundMicros(micros: Long, p: Int): Long = {
    if (p >= 6) return micros
    var unit = 1L
    var i = p
    while (i < 6) { unit *= 10; i += 1 }
    val rem = java.lang.Math.floorMod(micros, unit)
    val base = micros - rem
    if (rem * 2 >= unit) base + unit else base
  }

  private val TsText =
    ("""^(\d{1,4})-(\d{1,2})-(\d{1,2})[ T](\d{1,2}):(\d{2})(?::(\d{2}))?""" +
      """(\.\d+)?\s*(?:([+-])(\d{1,2})(?::?(\d{2}))?)?$""").r

  /** Parse pg timestamp input text (loose zone offsets allowed), round the
    * fraction to `p` digits, return epoch micros in UTC. Throws on
    * unparseable input (the caller's dialect-skip path handles it like any
    * other rejected statement). */
  def parseRound(s0: String, p: Int, convertZone: Boolean = false): Long = {
    val s = s0.trim
    s match {
      case TsText(y, mo, d, h, mi, se, fr, sign, oh, om) =>
        val secs = Option(se).map(_.toInt).getOrElse(0)
        // round the fraction in decimal TEXT space (a .9999995 carry must
        // propagate into whole seconds)
        val frac = BigDecimal(Option(fr).getOrElse(".0"))
          .setScale(math.min(p, 6), BigDecimal.RoundingMode.HALF_UP)
        val carry = if (frac >= 1) 1 else 0
        val fracMicros =
          if (frac >= 1) 0L
          else (frac * 1000000).toLongExact
        var ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
          h.toInt, mi.toInt, secs).plusSeconds(carry.toLong)
        // pg DISCARDS the zone on timestamp-without-time-zone input;
        // only the timestamptz path converts to UTC
        if (sign != null && convertZone) {
          val offSecs = oh.toInt * 3600 + Option(om).map(_.toInt * 60).getOrElse(0)
          ldt = if (sign == "+") ldt.minusSeconds(offSecs.toLong)
          else ldt.plusSeconds(offSecs.toLong)
        }
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + fracMicros
      case _ => parseExtended(s0, p, convertZone)
    }
  }

  // ---- extended pg input grammar (datatype-datetime §8.5.1): verbose
  // 'Mon Feb 10 17:32:01.5 1997 PST', compact '19970210 173201 -0800',
  // bare dates, named zone abbreviations ----

  private val namedZoneMinutes = Map(
    "UTC" -> 0, "GMT" -> 0, "Z" -> 0, "ZULU" -> 0,
    "PST" -> -8 * 60, "PDT" -> -7 * 60, "MST" -> -7 * 60, "MDT" -> -6 * 60,
    "CST" -> -6 * 60, "CDT" -> -5 * 60, "EST" -> -5 * 60, "EDT" -> -4 * 60,
    "AKST" -> -9 * 60, "AKDT" -> -8 * 60, "HST" -> -10 * 60,
    "BST" -> 60, "CET" -> 60, "CEST" -> 2 * 60, "EET" -> 2 * 60)

  private val monthNum = Map(
    "JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5, "JUN" -> 6,
    "JUL" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10, "NOV" -> 11, "DEC" -> 12)

  private def zoneMinutes(z: String): Int = {
    val t = z.trim.toUpperCase
    // POSIX decoration ABBREV+N: N hours WEST of UTC (sign inverted)
    """^([A-Za-z]{1,4})([+-])(\d{1,2})(?::?(\d{2}))?$""".r.findFirstMatchIn(t)
      .foreach { m =>
        val v = m.group(3).toInt * 60 + Option(m.group(4)).map(_.toInt).getOrElse(0)
        return if (m.group(2) == "+") -v else v
      }
    namedZoneMinutes.get(t).getOrElse {
      """^([+-])(\d{1,2}):?(\d{2})?$""".r.findFirstMatchIn(t) match {
        case Some(m) =>
          val v = m.group(2).toInt * 60 + Option(m.group(3)).map(_.toInt).getOrElse(0)
          if (m.group(1) == "-") -v else v
        case None => throw new IllegalArgumentException(
          s"""invalid input syntax for type timestamp: time zone "$z" not recognized""")
      }
    }
  }

  private val ZoneAlt = """[A-Za-z_]+/[A-Za-z_]+|[A-Za-z]{1,4}[+-]\d{1,2}(?::?\d{2})?|[A-Za-z]{1,4}|[+-]\d{1,2}(?::?\d{2})?"""
  private val Verbose =
    ("""^(?i)(?:(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*\s+)?""" +
      """(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+(\d{1,2})\s+""" +
      """(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?(\.\d+)?\s*([AP]M)?\s+(\d{4})""" +
      s"""(?:\\s+($ZoneAlt))?$$""").r
  private val Compact =
    s"""^(\\d{4})(\\d{2})(\\d{2})\\s+(\\d{2})(\\d{2})(\\d{2})(\\.\\d+)?(?:\\s+($ZoneAlt))?$$""".r
  private val BareDate = """^(\d{4})-(\d{1,2})-(\d{1,2})$""".r
  private val LooseIso =
    ("""^(\d{4})[-/](\d{1,2})[-/](\d{1,2})[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2}))?""" +
      s"""(\\.\\d+)?\\s*([AP]M)?\\s*($ZoneAlt)?$$""").r
  private val YearDoy =
    ("""^(\d{4})\.(\d{1,3})\s+(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?(\.\d+)?""" +
      s"""\\s*($ZoneAlt)?$$""").r

  private def build(y: Int, mo: Int, d: Int, h: Int, mi: Int, se: Int,
      fr: String, zone: String, p: Int, ampm: String = null,
      convertZone: Boolean = false): Long = {
    val frac = BigDecimal(Option(fr).getOrElse(".0"))
      .setScale(math.min(p, 6), BigDecimal.RoundingMode.HALF_UP)
    val carry = if (frac >= 1) 1 else 0
    val fracMicros = if (frac >= 1) 0L else (frac * 1000000).toLongExact
    val h2 = Option(ampm).map(_.toUpperCase) match {
      case Some("PM") if h < 12 => h + 12
      case Some("AM") if h == 12 => 0
      case _ => h
    }
    var ldt =
      try java.time.LocalDateTime.of(y, mo, d, h2, mi, se).plusSeconds(carry.toLong)
      catch { case e: java.time.DateTimeException =>
        throw new IllegalArgumentException(
          s"date/time field value out of range: ${e.getMessage}") }
    if (zone != null && zone.trim.nonEmpty && convertZone) {
      val t = zone.trim
      ldt = if (t.contains("/")) {
        // full IANA zone name: DST-aware conversion at the LOCAL datetime
        val zid = try java.time.ZoneId.of(t) catch { case _: Exception =>
          throw new IllegalArgumentException(
            s"""invalid input syntax for type timestamp: time zone "$t" not recognized""") }
        java.time.LocalDateTime.ofInstant(
          ldt.atZone(zid).toInstant, java.time.ZoneOffset.UTC)
      } else ldt.minusMinutes(zoneMinutes(t).toLong)
    }
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + fracMicros
  }

  private val YearSpace =
    ("""^(\d{4})\s+(\d{1,2})-(\d{1,2})\s+(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?""" +
      """(\.\d+)?\s*([A-Za-z]{1,4}|[+-]\d{1,2}(?::?\d{2})?)?$""").r

  private def parseExtended(s0: String, p: Int, cz: Boolean): Long = s0.trim match {
    case e if e.equalsIgnoreCase("epoch") => 0L
    case YearSpace(y, mo, d, h, mi, se, fr, zone) =>
      build(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt,
        Option(se).map(_.toInt).getOrElse(0), fr, zone, p, null, cz)
    case Verbose(mon, d, h, mi, se, fr, ampm, y, zone) =>
      build(y.toInt, monthNum(mon.toUpperCase.take(3)), d.toInt, h.toInt,
        mi.toInt, Option(se).map(_.toInt).getOrElse(0), fr, zone, p, ampm, cz)
    case Compact(y, mo, d, h, mi, se, fr, zone) =>
      build(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, se.toInt, fr, zone, p, null, cz)
    case BareDate(y, mo, d) =>
      build(y.toInt, mo.toInt, d.toInt, 0, 0, 0, null, null, p, null, cz)
    case LooseIso(y, mo, d, h, mi, se, fr, ampm, zone) =>
      build(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt,
        Option(se).map(_.toInt).getOrElse(0), fr, zone, p, ampm, cz)
    case YearDoy(y, doy, h, mi, se, fr, zone) =>
      val ld = java.time.LocalDate.ofYearDay(y.toInt, doy.toInt)
      build(ld.getYear, ld.getMonthValue, ld.getDayOfMonth, h.toInt, mi.toInt,
        Option(se).map(_.toInt).getOrElse(0), fr, zone, p, null, cz)
    case _ => throw new IllegalArgumentException(
      s"""invalid input syntax for type timestamp: "$s0"""")
  }

  case class PgTsIngest(children: Seq[Expression], convert: Boolean = false)
      extends Expression with CodegenFallback {
    override def foldable: Boolean = children.forall(_.foldable)
    override def dataType: DataType = TimestampType
    override def nullable: Boolean = true
    override def prettyName: String = "pg_ts_ingest"
    override def eval(input: InternalRow): Any = {
      val v = children(0).eval(input)
      val p = children(1).eval(input)
      if (v == null || p == null) return null
      v match {
        case micros: java.lang.Long => roundMicros(micros, p.toString.toInt)
        case days: java.lang.Integer
            if children(0).dataType == org.apache.spark.sql.types.DateType =>
          days.toLong * 86400000000L
        case other => parseRound(other.toString, p.toString.toInt, convert)
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class PgTsRound(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def foldable: Boolean = children.forall(_.foldable)
    override def dataType: DataType = TimestampType
    override def nullable: Boolean = true
    override def prettyName: String = "pg_ts_round"
    override def eval(input: InternalRow): Any = {
      val v = children(0).eval(input)
      val p = children(1).eval(input)
      if (v == null || p == null) return null
      roundMicros(v.asInstanceOf[java.lang.Long], p.toString.toInt)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** mz timestamptz canonical text at UTC: `2007-02-01 15:04:05+00`
    * (fraction trimmed). */
  case class PgTstzOut(child: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def foldable: Boolean = child.foldable
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val us = v.asInstanceOf[java.lang.Long].longValue
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val base = ldt.format(java.time.format.DateTimeFormatter.ofPattern(
        "yyyy-MM-dd HH:mm:ss" + (if (ldt.getNano != 0) ".SSSSSS" else "")))
        .replaceAll("(\\.\\d*?)0+$", "$1").stripSuffix(".")
      org.apache.spark.unsafe.types.UTF8String.fromString(base + "+00")
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_ts_ingest"),
      new ExpressionInfo(classOf[PgTsIngest].getName, "pg_ts_ingest"),
      (args: Seq[Expression]) => PgTsIngest(args)),
    (new FunctionIdentifier("pg_ts_round"),
      new ExpressionInfo(classOf[PgTsRound].getName, "pg_ts_round"),
      (args: Seq[Expression]) => PgTsRound(args)),
    // one-arg ingest form for PLAIN timestamp columns: the full pg input
    // grammar at micro precision
    (new FunctionIdentifier("pg_ts_in"),
      new ExpressionInfo(classOf[PgTsIngest].getName, "pg_ts_in"),
      (args: Seq[Expression]) => PgTsIngest(args :+
        org.apache.spark.sql.catalyst.expressions.Literal(6))),
    (new FunctionIdentifier("pg_tstz_ingest"),
      new ExpressionInfo(classOf[PgTsIngest].getName, "pg_tstz_ingest"),
      (args: Seq[Expression]) => PgTsIngest(args, convert = true)),
    (new FunctionIdentifier("pg_tstz_in"),
      new ExpressionInfo(classOf[PgTsIngest].getName, "pg_tstz_in"),
      (args: Seq[Expression]) => PgTsIngest(args :+
        org.apache.spark.sql.catalyst.expressions.Literal(6), convert = true)),
    (new FunctionIdentifier("pg_tstz_out"),
      new ExpressionInfo(classOf[PgTstzOut].getName, "pg_tstz_out"),
      (args: Seq[Expression]) => PgTstzOut(args.head)))
}
