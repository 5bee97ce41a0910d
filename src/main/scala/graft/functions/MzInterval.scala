package graft.functions

import scala.util.matching.Regex

/** The reference's interval text parser + pg-style renderer (reference
  * `src/repr/src/adt/datetime.rs` ParsedDateTime / `interval.rs` display;
  * corpus `test/sqllogictest/interval.slt`). Behavior reimplemented from the
  * corpus spec, not translated:
  *
  *  - SQL-standard groups: `Y-M`, `[H]:[M]:[S.f]` time group, a bare number
  *    resolving to DAY when a time group follows, else SECOND (or the
  *    qualifier's unit); leading colons trim only at part start with no sign.
  *  - pg named units with shorthands (`1y 2mon 3d 4h 5m 6.7s`), attached or
  *    space-separated, any order, each field settable once per group.
  *  - Fractional units cascade: year→months (truncated there), month→days→
  *    time, day→time; each component rounds half-up to integer
  *    microseconds separately before summing (the corpus states this rule).
  *  - Qualifier (`HOUR`, `MONTH TO MINUTE`, ...) assigns the ambiguous bare
  *    number and truncates fields less significant than its low end;
  *    `MINUTE TO SECOND` re-reads a 2-component time group as M:S.
  *  - Bounds: SQL-standard month in [-12,12], minute [-59,59], second
  *    [-60,60]; months/days are checked i32, micros checked i64.
  *  - Render: `N year[s] N mon[s] N day[s] HH:MM:SS[.f]`, plural unless the
  *    value is exactly 1, `+` prefixed to a positive component directly
  *    after a negative one, time shown when nonzero or nothing else is.
  */
object MzInterval {

  /** months / days / microseconds — the reference's Interval triple. */
  final case class Iv(months: Long, days: Long, micros: BigInt)

  private val fields = Seq("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND")
  private def rank(f: String): Int = fields.indexOf(f)

  private val unitWords: Map[String, String] = {
    def all(names: Seq[String], f: String) = names.map(_ -> f)
    (all(Seq("y", "yr", "yrs", "year", "years"), "YEAR") ++
      all(Seq("mon", "mons", "month", "months"), "MONTH") ++
      all(Seq("d", "day", "days"), "DAY") ++
      all(Seq("h", "hr", "hrs", "hour", "hours"), "HOUR") ++
      all(Seq("m", "min", "mins", "minute", "minutes"), "MINUTE") ++
      all(Seq("s", "sec", "secs", "second", "seconds"), "SECOND") ++
      all(Seq("millennium", "millenniums", "millennia"), "MILLENNIUM") ++
      all(Seq("century", "centuries"), "CENTURY") ++
      all(Seq("decade", "decades"), "DECADE") ++
      all(Seq("w", "week", "weeks"), "WEEK") ++
      all(Seq("ms", "millisecond", "milliseconds"), "MS") ++
      all(Seq("us", "microsecond", "microseconds"), "US")).toMap
  }

  private val MicrosI = BigInt(1000000L)
  /** Numeric part text -> value; fractional digits beyond 9 are TRUNCATED
    * (the reference parses at nanosecond text precision:
    * '1.999999999999999999 days' behaves as 1.999999999 days). */
  private def bd(s: String): BigDecimal =
    BigDecimal(s).setScale(9, BigDecimal.RoundingMode.DOWN)

  private final class State {
    var months: BigInt = 0
    var days: BigInt = 0
    var micros: BigInt = 0
    val set = scala.collection.mutable.Set.empty[String]
    def mark(err: => String, fs: String*): Either[String, Unit] = {
      val dup = fs.filter(set.contains)
      if (dup.nonEmpty) Left(err) else { fs.foreach(set += _); Right(()) }
    }
  }

  private val MicrosPerSec = BigDecimal(1000000L)

  /** Each component converts to integer microseconds SEPARATELY, rounding
    * half-up — the corpus states the rule outright ("they each separately
    * get rounded to 6 digits and added together"). */
  private def toMicros(v: BigDecimal, secsPerUnit: BigDecimal): BigInt =
    (v * secsPerUnit * MicrosPerSec)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt

  private def addUnit(st: State, unit: String, v: BigDecimal, raw: String): Either[String, Unit] = unit match {
    case "YEAR" | "DECADE" | "CENTURY" | "MILLENNIUM" =>
      st.mark(s"""$unit field set twice: "$raw"""", unit).map { _ =>
        val perUnit = unit match {
          case "YEAR" => 12; case "DECADE" => 120
          case "CENTURY" => 1200; case _ => 12000
        }
        // fractional year-like units expand to months and STOP there
        st.months += (v * perUnit).setScale(0, BigDecimal.RoundingMode.DOWN).toBigInt
      }
    case "WEEK" =>
      st.mark(s"""WEEK field set twice: "$raw"""", "WEEK").map { _ =>
        val d = v * 7
        val whole = d.setScale(0, BigDecimal.RoundingMode.DOWN)
        st.days += whole.toBigInt
        st.micros += toMicros(d - whole, BigDecimal(86400))
      }
    case "MONTH" =>
      st.mark(s"""MONTH field set twice: "$raw"""", "MONTH").map { _ =>
        val whole = v.setScale(0, BigDecimal.RoundingMode.DOWN)
        st.months += whole.toBigInt
        val fracDays = (v - whole) * 30
        val wholeDays = fracDays.setScale(0, BigDecimal.RoundingMode.DOWN)
        st.days += wholeDays.toBigInt
        st.micros += toMicros(fracDays - wholeDays, BigDecimal(86400))
      }
    case "DAY" =>
      st.mark(s"""DAY field set twice: "$raw"""", "DAY").map { _ =>
        val whole = v.setScale(0, BigDecimal.RoundingMode.DOWN)
        st.days += whole.toBigInt
        st.micros += toMicros(v - whole, BigDecimal(86400))
      }
    case "HOUR" | "MINUTE" | "SECOND" | "MS" | "US" =>
      // reference datetime.rs: "Cannot set MILLISECONDS or MICROSECONDS
      // field if SECOND field has a fraction component" — ONLY a
      // fractional SECOND blocks the finer units (fractional ms + us is
      // legal, interval.slt:1192-1199)
      val alsoMarks: Seq[String] =
        if (unit == "SECOND" && !v.isWhole) Seq("MS", "US") else Seq.empty
      st.mark(
        if ((unit == "MS" || unit == "US") && st.set.contains(unit) &&
            st.set.contains("SECOND"))
          "Cannot set MILLISECONDS or MICROSECONDS field if SECOND field " +
            s"""has a fraction component: "$raw""""
        else s"""$unit field set twice: "$raw"""",
        (unit +: alsoMarks): _*).map { _ =>
        val secs = unit match {
          case "HOUR" => BigDecimal(3600)
          case "MINUTE" => BigDecimal(60)
          case "SECOND" => BigDecimal(1)
          case "MS" => BigDecimal("0.001")
          case _ => BigDecimal("0.000001")
        }
        st.micros += toMicros(v, secs)
      }
  }

  private val YmGroup: Regex = """^([+-]?)(\d+)-(\d*)$""".r
  private val Num: Regex = """^([+-]?)(\d*\.?\d+|\d+\.)$""".r
  private val NumUnit: Regex = """^([+-]?)(\d*\.?\d+|\d+\.)([A-Za-z]+)$""".r
  private val Word: Regex = """^([A-Za-z]+)$""".r

  /** One parsed-but-unresolved bare number. */
  private final case class Pending(v: BigDecimal, raw: String)

  // scalastyle:off cyclomatic.complexity method.length
  def parse(text: String, qualifier: Option[(String, Option[String])]): Either[String, Iv] = {
    val raw = text.trim
    def err(m: String) = Left(m)
    // validate qualifier range
    qualifier match {
      case Some((a, Some(b))) if rank(a) >= rank(b) =>
        return err(s"invalid qualifier range $a TO $b")
      case Some((a, _)) if rank(a) < 0 => return err(s"unknown qualifier $a")
      case Some((_, Some(b))) if rank(b) < 0 => return err(s"unknown qualifier")
      case _ => ()
    }
    val minuteToSecond = qualifier.contains(("MINUTE", Some("SECOND")))
    val st = new State
    var pending: Option[Pending] = None
    var pendingResolved = false
    // pg's datetime tokenizer treats misc punctuation as delimiters
    // ('02-01!1~01:02:03' == '02-01 1 01:02:03')
    val parts = raw.replaceAll("[^0-9A-Za-z+\\-.:\\s]", " ")
      .split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return err("empty interval string")

    def timeGroup(sign: Int, body: String, attachedUnitOk: Boolean): Either[String, Unit] = {
      // strip a trailing attached DateTimeField annotation ('01:02:03minute')
      // — but only when it IS a known unit word; '1:02:03xyz' must raise the
      // reference's unknown-units error, not silently parse as 01:02:03
      if (attachedUnitOk) """[A-Za-z]+$""".r.findFirstIn(body).foreach { w =>
        if (!unitWords.contains(w.toLowerCase)) return err(s"unknown units $w")
      }
      val stripped =
        if (attachedUnitOk) """[A-Za-z]+$""".r.replaceFirstIn(body, "")
        else body
      val comps = stripped.split(":", -1)
      if (comps.length > 3) return err(s"""invalid time component: "$raw"""")
      def num(s: String): Either[String, BigDecimal] =
        if (s.isEmpty) Right(BigDecimal(0))
        else if (s.matches("""\d*\.?\d+""")) Right(bd(s))
        else err(s"""have unprocessed tokens in "$raw"""")
      // fraction allowed only in the last component
      comps.dropRight(1).find(_.contains(".")).foreach { c =>
        return err(s"""have unprocessed tokens ${c.dropWhile(_ != '.')}""")
      }
      val vals = comps.map(num)
      vals.collectFirst { case Left(e) => e } match {
        case Some(e) => return Left(e)
        case None => ()
      }
      val v = vals.map(_.toOption.get)
      val (h, m, s) =
        if (comps.length == 3) (v(0), v(1), v(2))
        else if (comps.length == 2) {
          // a fraction marks the trailing component as SECONDS ('0:.27');
          // MINUTE TO SECOND reads the whole group as M:S
          if (minuteToSecond || comps(1).contains("."))
            (BigDecimal(0), v(0), v(1))
          else (v(0), v(1), BigDecimal(0))
        } else (v(0), BigDecimal(0), BigDecimal(0))
      if (m.abs > 59) return err(
        s"""MINUTE must be [-59, 59], got ${m.toBigInt}: "$raw"""")
      if (s.abs > 60) return err(
        s"""SECOND must be [-60, 60], got ${s.toBigInt}: "$raw"""")
      for {
        _ <- st.mark(s"""HOUR, MINUTE, SECOND field set twice: "$raw"""",
          "HOUR", "MINUTE", "SECOND")
      } yield {
        st.micros += (toMicros(h, BigDecimal(3600)) + toMicros(m, BigDecimal(60)) +
          toMicros(s, BigDecimal(1))) * sign
        ()
      }
    }

    var i = 0
    var sawTimeGroupAfterPending = false
    var result: Either[String, Unit] = Right(())
    while (i < parts.length && result.isRight) {
      val part0 = parts(i)
      // leading-colon trimming: only when the part starts with ':' outright
      val part =
        if (part0.startsWith(":")) part0.dropWhile(_ == ':')
        else part0
      val trimmed = part0.startsWith(":")
      result = part match {
        case "" => Right(()) // all-colon part
        case YmGroup(sgn, y, m) =>
          val sign = if (sgn == "-") -1 else 1
          val mv = if (m.isEmpty) BigInt(0) else BigInt(m)
          if (mv > 12) err(s"""MONTH must be [-12, 12], got $mv: "$raw"""")
          else st.mark(s"""YEAR or MONTH field set twice: "$raw"""", "YEAR", "MONTH")
            .map { _ => st.months += (BigInt(y) * 12 + mv) * sign; () }
        case p if p.contains(":") || (trimmed && p.matches("""[+-]?\d*\.?\d*:?.*""") && p.contains(":")) =>
          val (sign, body) =
            if (p.startsWith("-")) (-1, p.drop(1))
            else if (p.startsWith("+")) (1, p.drop(1)) else (1, p)
          if (pending.isDefined && !pendingResolved) {
            // the bare number before a time group is DAY
            val pd = pending.get
            pendingResolved = true
            sawTimeGroupAfterPending = true
            addUnit(st, "DAY", pd.v, raw) match {
              case Left(e) => Left(e)
              case Right(()) => timeGroup(sign, body, attachedUnitOk = true)
            }
          } else timeGroup(sign, body, attachedUnitOk = true)
        case NumUnit(sgn, n, w) =>
          unitWords.get(w.toLowerCase) match {
            case None => err(s"unknown units $w")
            case Some(u) =>
              val v = bd(n) * (if (sgn == "-") -1 else 1)
              addUnit(st, u, v, raw)
          }
        case Num(sgn, n) =>
          if (pending.isDefined && !pendingResolved)
            err(s"""cannot determine format of all parts: "$raw"""")
          else {
            pending = Some(Pending(bd(n) * (if (sgn == "-") -1 else 1), part))
            pendingResolved = false
            Right(())
          }
        case Word(w) =>
          unitWords.get(w.toLowerCase) match {
            case None => err(s"unknown units $w")
            case Some(u) =>
              pending match {
                case Some(pd) if !pendingResolved =>
                  pendingResolved = true
                  addUnit(st, u, pd.v, raw)
                case _ => Right(()) // trailing annotation, no-op
              }
          }
        case other =>
          // mixed token like '1+2:3.4' or '1x2:3.4'
          """^[+-]?\d*\.?\d*([A-Za-z])""".r.findFirstMatchIn(other) match {
            case Some(m) => err(s"unknown units ${m.group(1)}")
            case None => err(s"""invalid input syntax for type interval: "$raw"""")
          }
      }
      i += 1
    }
    result match {
      case Left(e) => return Left(e)
      case Right(()) => ()
    }
    // resolve a trailing ambiguous number: qualifier unit, else SECOND
    pending.filter(_ => !pendingResolved).foreach { pd =>
      val unit = qualifier match {
        case Some((a, Some(b))) => b
        case Some((a, None)) => a
        case None => "SECOND"
      }
      addUnit(st, unit, pd.v, raw) match {
        case Left(e) => return Left(e)
        case Right(()) => ()
      }
    }
    // qualifier truncation: discard fields less significant than the low end
    qualifier.foreach { case (a, to) =>
      val low = to.getOrElse(a)
      rank(low) match {
        case 0 => st.months = (st.months / 12) * 12; st.days = 0; st.micros = 0
        case 1 => st.days = 0; st.micros = 0
        case 2 => st.micros = 0
        case 3 => st.micros = (st.micros / (3600L * 1000000L)) * (3600L * 1000000L)
        case 4 => st.micros = (st.micros / (60L * 1000000L)) * (60L * 1000000L)
        case _ => ()
      }
    }
    val i32 = BigInt(Int.MaxValue)
    if (st.months.abs > i32 + (if (st.months < 0) 1 else 0) ||
        st.days.abs > i32 + (if (st.days < 0) 1 else 0))
      return err(s"""interval out of range: "$raw"""")
    if (st.micros.abs > BigInt(Long.MaxValue) + (if (st.micros < 0) 1 else 0))
      return err(s"""interval out of range: "$raw"""")
    Right(Iv(st.months.toLong, st.days.toLong, st.micros))
  }
  // scalastyle:on

  /** pg-style rendering ("postgres" IntervalStyle). */
  def render(iv: Iv): String = {
    val y = iv.months / 12
    val mo = iv.months % 12
    val out = scala.collection.mutable.Buffer.empty[(String, Boolean)] // (text, isNegative)
    def unit(v: Long, name: String): Unit =
      if (v != 0) out += ((s"$v $name" + (if (v == 1) "" else "s"), v < 0))
    unit(y, "year")
    unit(mo, "mon")
    unit(iv.days, "day")
    val showTime = iv.micros != 0 || out.isEmpty
    if (showTime) {
      val neg = iv.micros < 0
      val a = iv.micros.abs
      val secsAll = a / MicrosI
      val frac = (a % MicrosI).toLong
      val h = secsAll / 3600
      val m = (secsAll % 3600) / 60
      val s = secsAll % 60
      val fracStr =
        if (frac == 0) ""
        else "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
      out += (((if (neg) "-" else "") + f"$h%02d:$m%02d:$s%02d$fracStr", neg))
    }
    val sb = new StringBuilder
    var prevNeg = false
    out.zipWithIndex.foreach { case ((txt, neg), idx) =>
      if (idx > 0) sb.append(' ')
      if (idx > 0 && prevNeg && !neg && !txt.startsWith("-")) sb.append('+')
      sb.append(txt)
      prevNeg = neg
    }
    sb.toString
  }

  /** Normalize a SQL qualifier word (case/plural-insensitive: `years`,
    * `MINUTE`, ...) to its canonical field name; unknown words pass through
    * so parse() reports them. */
  private def qualField(w: String): String =
    unitWords.getOrElse(w.trim.toLowerCase, w.trim.toUpperCase)

  private def parseQualifier(qualifier: String): Option[(String, Option[String])] =
    Option(qualifier).map(_.trim).filter(_.nonEmpty).map { s =>
      s.split("(?i)\\s+TO\\s+").toList match {
        case a :: b :: Nil => (qualField(a), Some(qualField(b)))
        case a :: Nil => (qualField(a), None)
        case _ => (s.toUpperCase, None)
      }
    }

  /** Parse-and-render: the engine's canonical interval text. Throws on bad
    * input with the reference's message prefix (the SLT `statement error`
    * path relies on an error being raised). */
  private val SecPrecision = """(?i)\(\s*(\d+)\s*\)""".r

  def canonical(text: String, qualifier: String): String = {
    // SECOND(p): round the seconds fraction to p digits (corpus:
    // `INTERVAL '...' SECOND(5)`), applied after parsing
    val prec = Option(qualifier).flatMap(q =>
      SecPrecision.findFirstMatchIn(q).map(_.group(1).toInt))
    val qualClean = Option(qualifier).map(q => SecPrecision.replaceAllIn(q, "")).orNull
    parse(text, parseQualifier(qualClean)) match {
      case Right(iv0) =>
        val iv = prec.filter(_ < 6).fold(iv0) { p =>
          val f = BigInt(10).pow(6 - p)
          val half = f / 2
          val rounded = (iv0.micros.abs + half) / f * f * iv0.micros.signum
          iv0.copy(micros = rounded)
        }
        if (iv.micros.abs > BigInt(Long.MaxValue) + (if (iv.micros < 0) 1 else 0))
          throw new IllegalArgumentException(
            s"invalid input syntax for type interval: interval out of range")
        render(iv)
      case Left(e) => throw new IllegalArgumentException(
        s"invalid input syntax for type interval: $e")
    }
  }

  /** mz interval comparison: lexicographic over (months, days, micros) —
    * the corpus asserts `'1 day' > '9999999 hours'` (reference interval.rs
    * Ord derive over the field triple). */
  def compare(op: String, a: String, qa: String, b: String, qb: String): Boolean = {
    def p(text: String, q: String): Iv =
      parse(text, parseQualifier(q)).fold(
        e => throw new IllegalArgumentException(s"invalid input syntax for type interval: $e"),
        identity)
    val x = p(a, qa); val y = p(b, qb)
    val c =
      if (x.months != y.months) x.months.compare(y.months)
      else if (x.days != y.days) x.days.compare(y.days)
      else x.micros.compare(y.micros)
    op match {
      case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0
      case ">=" => c >= 0; case "=" => c == 0
      case "!=" | "<>" => c != 0
      case other => throw new IllegalArgumentException(s"unsupported interval comparison $other")
    }
  }

  /** interval × / ÷ f64 with the reference's f64 semantics (reference
    * src/repr/src/adt/interval.rs:209-252 checked_mul/checked_div):
    * fractional months spill ×30 into days, fractional days ×86400e6 into
    * micros, each component truncated toward zero; NaN/∞/overflow error.
    * f64 (not decimal) arithmetic is LOAD-BEARING: `1 month / 30` rounds to
    * exactly 1.0 day only in binary floating point. */
  def scale(text: String, qualifier: String, op: String, factor: Double): String = {
    val iv = parse(text, parseQualifier(qualifier)).fold(
      e => throw new IllegalArgumentException(s"invalid input syntax for type interval: $e"),
      identity)
    def apply(a: Double): Double = if (op == "/") a / factor else a * factor
    val mF = apply(iv.months.toDouble)
    if (mF.isNaN || mF.isInfinite || mF < Int.MinValue || mF > Int.MaxValue)
      throw new IllegalArgumentException("interval out of range")
    val dF = apply(iv.days.toDouble) + (mF - mF.toLong) * 30.0
    if (dF.isNaN || dF.isInfinite || dF < Int.MinValue || dF > Int.MaxValue)
      throw new IllegalArgumentException("interval out of range")
    val usF = apply(iv.micros.toDouble) + (dF - dF.toLong) * 86400.0e6
    // >= : (double)Long.MaxValue rounds UP past the true max, so a product
    // landing exactly there (negating Long.MinValue µs) must error too
    if (usF.isNaN || usF.isInfinite || usF < Long.MinValue || usF >= Long.MaxValue.toDouble)
      throw new IllegalArgumentException("interval out of range")
    render(Iv(mF.toLong, dF.toLong, BigInt(usF.toLong)))
  }

  private val MicrosPerDay = BigInt(86400L * 1000000L)

  private def checkI32(v: BigInt, raw: String): Unit =
    if (v > Int.MaxValue || v < Int.MinValue)
      throw new IllegalArgumentException(s""""$raw" interval out of range""")

  /** pg justify_hours / justify_days / justify_interval (reference
    * `src/expr/src/scalar/func.rs` justify_*; pg timestamp.c):
    * hours spill into days at 24, days into months at 30, and
    * justify_interval additionally borrows so all fields share a sign. */
  def justify(kind: String, text: String, qualifier: String): String = {
    val iv = parse(text, parseQualifier(qualifier)).fold(
      e => throw new IllegalArgumentException(s"invalid input syntax for type interval: $e"),
      identity)
    var months = BigInt(iv.months)
    var days = BigInt(iv.days)
    var micros = iv.micros
    def hours(): Unit = {
      days += micros / MicrosPerDay
      micros = micros % MicrosPerDay
    }
    def daysToMonths(): Unit = {
      months += days / 30
      days = days % 30
    }
    kind match {
      case "hours" => hours(); checkI32(days, text)
      case "days" => daysToMonths(); checkI32(months, text)
      case _ => // justify_interval: both plus sign borrowing
        hours(); daysToMonths()
        if (months > 0 && (days < 0 || (days == 0 && micros < 0))) {
          months -= 1; days += 30
        } else if (months < 0 && (days > 0 || (days == 0 && micros > 0))) {
          months += 1; days -= 30
        }
        if (days > 0 && micros < 0) { days -= 1; micros += MicrosPerDay }
        else if (days < 0 && micros > 0) { days += 1; micros -= MicrosPerDay }
        checkI32(months, text); checkI32(days, text)
    }
    render(Iv(months.toLong, days.toLong, micros))
  }

  /** EXTRACT(field FROM interval) / date_part over the parsed triple
    * (reference interval.rs part extraction; epoch months factor is pg's
    * 365.25/12 days = 2,629,800 s). Returns pg's numeric text. */
  def extract(field: String, text: String, qualifier: String): String = {
    val iv = parse(text, parseQualifier(qualifier)).fold(
      e => throw new IllegalArgumentException(s"invalid input syntax for type interval: $e"),
      identity)
    def trim(v: BigDecimal): String = {
      val s = v.setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
        .underlying.stripTrailingZeros.toPlainString
      s
    }
    field.toLowerCase match {
      case "epoch" =>
        // whole years at 365.25 days, leftover months at 30 days (the
        // reference mirrors pg's interval epoch arithmetic)
        trim(BigDecimal(iv.months / 12) * 31557600 +
          BigDecimal(iv.months % 12) * 2592000 +
          BigDecimal(iv.days) * 86400 + BigDecimal(iv.micros) / 1000000)
      case "millennium" => (iv.months / 12000).toString
      case "century" => (iv.months / 1200).toString
      case "decade" => (iv.months / 120).toString
      case "year" | "years" => (iv.months / 12).toString
      case "month" | "months" => (iv.months % 12).toString
      case "day" | "days" => iv.days.toString
      case "hour" | "hours" => (iv.micros / (3600L * 1000000L)).toString
      case "minute" | "minutes" => ((iv.micros / (60L * 1000000L)) % 60).toString
      case "second" | "seconds" =>
        trim(BigDecimal(iv.micros % (60L * 1000000L)) / 1000000)
      case "millisecond" | "milliseconds" =>
        trim(BigDecimal(iv.micros % (60L * 1000000L)) / 1000)
      case "microsecond" | "microseconds" =>
        (iv.micros % (60L * 1000000L)).toString
      case other => throw new IllegalArgumentException(
        s"unsupported interval extract field $other")
    }
  }

  /** pg's age(t1, t2): symbolic calendar difference — field-wise
    * subtraction with borrowing, day borrow taking the EARLIER timestamp's
    * month length (pg timestamp.c timestamp_age; reference
    * `src/expr/src/scalar/func.rs` age). t1 < t2 negates the swapped
    * result field-wise, pg's behavior. Input epochs are microseconds. */
  def age(aMicros: Long, bMicros: Long): Iv = {
    import java.time.{Instant, LocalDateTime, ZoneOffset}
    def ldt(us: Long): LocalDateTime = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L), ZoneOffset.UTC)
    if (aMicros < bMicros) {
      val p = age(bMicros, aMicros)
      Iv(-p.months, -p.days, -p.micros)
    } else {
      val a = ldt(aMicros); val b = ldt(bMicros)
      var us = (a.getNano - b.getNano) / 1000L
      var sec = a.getSecond - b.getSecond
      var min = a.getMinute - b.getMinute
      var hour = a.getHour - b.getHour
      var day = a.getDayOfMonth - b.getDayOfMonth
      var mon = a.getMonthValue - b.getMonthValue
      var year = a.getYear - b.getYear
      if (us < 0) { us += 1000000L; sec -= 1 }
      if (sec < 0) { sec += 60; min -= 1 }
      if (min < 0) { min += 60; hour -= 1 }
      if (hour < 0) { hour += 24; day -= 1 }
      if (day < 0) {
        day += java.time.YearMonth.of(b.getYear, b.getMonthValue).lengthOfMonth()
        mon -= 1
      }
      if (mon < 0) { mon += 12; year -= 1 }
      Iv(year.toLong * 12 + mon, day.toLong,
        BigInt(hour) * 3600000000L + BigInt(min) * 60000000L +
          BigInt(sec) * 1000000L + us)
    }
  }

  /** Componentwise checked add/subtract for the corpus' interval ± interval. */
  def binop(op: String, a: String, qa: String, b: String, qb: String, negateB: Boolean): String = {
    def p(t: String, q: String): Iv =
      parse(t, parseQualifier(q)).fold(
        e => throw new IllegalArgumentException(s"invalid input syntax for type interval: $e"),
        identity)
    val x = p(a, qa)
    val y0 = p(b, qb)
    // negation happens FIRST in the reference (checked_neg before
    // checked_add): i32::MIN months/days and i64::MIN micros overflow
    def checkNeg(v: Iv): Unit =
      if (v.months == Int.MinValue.toLong || v.days == Int.MinValue.toLong ||
          v.micros == BigInt(Long.MinValue))
        throw new IllegalArgumentException("interval out of range")
    if (negateB) checkNeg(y0)
    val y = if (negateB) Iv(-y0.months, -y0.days, -y0.micros) else y0
    val r = op match {
      case "+" => Iv(x.months + y.months, x.days + y.days, x.micros + y.micros)
      case "-" =>
        checkNeg(y)
        Iv(x.months - y.months, x.days - y.days, x.micros - y.micros)
      case _ => throw new IllegalArgumentException(s"unsupported interval op $op")
    }
    if (r.months.abs > Int.MaxValue || r.days.abs > Int.MaxValue ||
        r.micros.abs > BigInt(Long.MaxValue))
      throw new IllegalArgumentException("interval out of range")
    render(r)
  }
}
