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
  def parseRound(s0: String, p: Int): Long = {
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
        if (sign != null) {
          val offSecs = oh.toInt * 3600 + Option(om).map(_.toInt * 60).getOrElse(0)
          ldt = if (sign == "+") ldt.minusSeconds(offSecs.toLong)
          else ldt.plusSeconds(offSecs.toLong)
        }
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + fracMicros
      case _ => throw new IllegalArgumentException(
        s"""invalid input syntax for type timestamp: "$s0"""")
    }
  }

  case class PgTsIngest(children: Seq[Expression])
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
        case other => parseRound(other.toString, p.toString.toInt)
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

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_ts_ingest"),
      new ExpressionInfo(classOf[PgTsIngest].getName, "pg_ts_ingest"),
      (args: Seq[Expression]) => PgTsIngest(args)),
    (new FunctionIdentifier("pg_ts_round"),
      new ExpressionInfo(classOf[PgTsRound].getName, "pg_ts_round"),
      (args: Seq[Expression]) => PgTsRound(args)))
}
