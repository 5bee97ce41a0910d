package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Round}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}

/** pg float rounding family: `ceil(float8) -> float8`, `floor(float8) ->
  * float8` (reference `src/expr/src/scalar/func.rs` CeilFloat64/FloorFloat64;
  * pg numeric functions). Spark's builtins return BIGINT, which overflows
  * and re-types the huge float values pg round-trips exactly. */
object PgNumericFunctions {

  case class PgFloatRound(children: Seq[Expression], up: Boolean)
      extends Expression with CodegenFallback {
    override def dataType: DataType = children(0).dataType match {
      case FloatType => FloatType
      case _ => DoubleType
    }
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val v = children(0).eval(input)
      if (v == null) return null
      v match {
        case f: Float =>
          (if (up) math.ceil(f.toDouble) else math.floor(f.toDouble)).toFloat
        case d: Double => if (up) math.ceil(d) else math.floor(d)
        case other =>
          val d = other.toString.toDouble
          if (up) math.ceil(d) else math.floor(d)
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** Domain-checked sqrt/ln (reference `src/expr/src/scalar/func/impls/
    * float64.rs:260` NegSqrt; `impls/numeric.rs:80-86` log_guard_numeric):
    * pg raises where Spark yields NaN or NULL. The value path is exactly
    * Spark's double math, so every in-domain render is unchanged. */
  case class PgCheckedMath(child: Expression, kind: String)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = s"pg_$kind"
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val d = v match {
        case f: Float => f.toDouble
        case dd: Double => dd
        case dec: Decimal => dec.toDouble
        case other => other.toString.toDouble
      }
      kind match {
        case "sqrt" =>
          if (d < 0) throw new ArithmeticException(
            "cannot take square root of a negative number")
          math.sqrt(d)
        case "sin" | "cos" | "tan" | "cot" =>
          // reference InfinityOutOfDomain (scalar.rs:1946)
          if (d.isInfinite) throw new ArithmeticException(
            s"function $kind is only defined for finite arguments")
          kind match {
            case "sin" => math.sin(d); case "cos" => math.cos(d)
            case "tan" => math.tan(d); case _ => 1.0 / math.tan(d)
          }
        case "asin" | "acos" =>
          // pg: NaN-producing inverse-trig input raises (float.c asin/acos)
          if (d.isNaN) Double.NaN
          else if (d < -1 || d > 1) throw new ArithmeticException(
            "input is out of range")
          else if (kind == "asin") math.asin(d) else math.acos(d)
        case "atanh" =>
          if (d.isNaN) Double.NaN
          else if (d < -1 || d > 1) throw new ArithmeticException(
            "input is out of range")
          else math.log((1 + d) / (1 - d)) / 2
        case "acosh" =>
          if (d.isNaN) Double.NaN
          else if (d < 1) throw new ArithmeticException(
            "input is out of range")
          else math.log(d + math.sqrt(d * d - 1))
        case "exp" =>
          // pg float8 exp raises instead of rounding to 0 / inf
          // (float.c dexp: ERANGE overflow/underflow errors)
          val r = math.exp(d)
          if (!d.isNaN && d.isInfinite && d < 0) 0.0 // exp(-inf) = 0, legal
          else if (r.isInfinite && !d.isInfinite) throw new ArithmeticException(
            "value out of range: overflow")
          else if (r == 0.0 && !d.isInfinite) throw new ArithmeticException(
            "value out of range: underflow")
          else r
        case _ =>
          if (d < 0) throw new ArithmeticException(
            s"function $kind is not defined for negative numbers")
          if (d == 0) throw new ArithmeticException(
            s"function $kind is not defined for zero")
          if (kind == "ln") math.log(d) else math.log10(d)
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren(0))
  }

  /** Two-arg round with pg's signature check: `round(float8, int)` does not
    * exist in pg (only numeric takes a scale — reference
    * `src/expr/src/scalar/func.rs` RoundNumeric; pg round(v numeric, s
    * int)); Spark's builtin happily rounds doubles. Valid input delegates
    * to Spark's Round so values and types are unchanged. */
  case class PgRound2(left: Expression, right: Expression)
      extends Expression with CodegenFallback {
    private lazy val delegate = Round(left, right)
    override def children: Seq[Expression] = Seq(left, right)
    override def nullable: Boolean = true
    override def dataType: DataType = delegate.dataType
    override def prettyName: String = "pg_round"
    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case DoubleType | FloatType =>
        TypeCheckResult.TypeCheckFailure(
          "function round(double precision, integer) does not exist")
      case _ => delegate.checkInputDataTypes()
    }
    override def eval(input: InternalRow): Any = delegate.eval(input)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(left = newChildren(0), right = newChildren(1))
  }

  /** pg cast fidelity for FOLDABLE numeric casts (literal pipelines — the
    * corpus' cast records; non-foldable column casts keep Spark's native
    * codegen'd cast so hot paths are untouched). Reference
    * `src/expr/src/scalar/func/impls/float64.rs` CastFloat64ToInt32 et al:
    * float->int rounds HALF EVEN and range-checks; numeric->int rounds
    * half away from zero; float8->float4 and text->float raise on
    * overflow/underflow instead of saturating; float->numeric raises
    * `numeric field overflow` where the 39-digit type can't hold the
    * value. */
  /** mz numeric -> text: trailing fraction zeros stripped (reference
    * numeric.rs rescaling on render); plain notation, never E-form. */
  case class MzNumericText(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "mz_numeric_text"
    override protected def nullSafeEval(v: Any): Any = {
      val bd = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.stripTrailingZeros
      val s = if (bd.signum == 0) "0" else bd.toPlainString
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    }
    override protected def withNewChildInternal(c: Expression): MzNumericText =
      copy(child = c)
  }

  case class PgCheckedCast(child: Expression, to: DataType)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = to
    override def prettyName: String = "pg_checked_cast"

    private def renderDouble(d: Double): String = {
      if (d == d.longValue.toDouble && math.abs(d) < 1e18) d.longValue.toString
      else {
        val bd = new java.math.BigDecimal(d)
        bd.toPlainString.replaceAll("\\.0+$", "")
      }
    }
    private def intName(t: DataType): String = t match {
      case ShortType => "smallint"
      case IntegerType => "integer"
      case _ => "bigint"
    }
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      (v, to) match {
        case (d: java.lang.Number, ShortType | IntegerType | LongType)
            if child.dataType == DoubleType || child.dataType == FloatType =>
          val dv = d.doubleValue
          if (dv.isNaN || dv.isInfinite)
            throw new ArithmeticException(s"${intName(to)} out of range")
          val r = math.rint(dv) // pg float->int rounds half even
          val (lo, hi) = to match {
            case ShortType => (Short.MinValue.toDouble, Short.MaxValue.toDouble)
            case IntegerType => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
            case _ => (Long.MinValue.toDouble, Long.MaxValue.toDouble)
          }
          // the Long bound check must be strict on the high side: 2^63
          // rounds to itself in double and overflows
          if (r < lo || r > hi || (to == LongType && r >= 9.223372036854776e18))
            throw new ArithmeticException(
              s""""${renderDouble(dv)}" ${intName(to)} out of range""")
          to match {
            case ShortType => r.toShort
            case IntegerType => r.toInt
            case _ => r.toLong
          }
        case (dec: Decimal, ShortType | IntegerType | LongType) =>
          // pg numeric->int rounds half AWAY from zero
          val r = dec.toJavaBigDecimal.setScale(0, java.math.RoundingMode.HALF_UP)
          def fits(lo: Long, hi: Long): Boolean =
            r.compareTo(java.math.BigDecimal.valueOf(lo)) >= 0 &&
              r.compareTo(java.math.BigDecimal.valueOf(hi)) <= 0
          val ok = to match {
            case ShortType => fits(Short.MinValue, Short.MaxValue)
            case IntegerType => fits(Int.MinValue, Int.MaxValue)
            case _ => fits(Long.MinValue, Long.MaxValue)
          }
          if (!ok) throw new ArithmeticException(
            s""""${dec.toJavaBigDecimal.toPlainString}" ${intName(to)} out of range""")
          to match {
            case ShortType => r.shortValueExact
            case IntegerType => r.intValueExact
            case _ => r.longValueExact
          }
        case (d: java.lang.Number, FloatType) if child.dataType == DoubleType =>
          val dv = d.doubleValue
          val f = dv.toFloat
          if (dv.isNaN || dv.isInfinite) f
          else if (f.isInfinite) throw new ArithmeticException(
            s""""${renderDouble(dv)}" real out of range""")
          else if (f == 0.0f && dv != 0.0) throw new ArithmeticException(
            s""""${renderDouble(dv)}" real out of range""")
          else f
        case (s: Any, FloatType | DoubleType) if child.dataType == StringType =>
          val raw = s.toString.trim
          val lower = raw.toLowerCase
          val special = Set("nan", "inf", "+inf", "-inf", "infinity",
            "+infinity", "-infinity")
          if (special.contains(lower)) {
            val d = lower match {
              case "nan" => Double.NaN
              case l if l.startsWith("-") => Double.NegativeInfinity
              case _ => Double.PositiveInfinity
            }
            if (to == FloatType) d.toFloat else d
          } else {
            val d =
              try raw.toDouble
              catch { case _: Exception => throw new IllegalArgumentException(
                s"""invalid input syntax for type ${
                  if (to == FloatType) "real" else "double precision"}: "$raw"""") }
            val zeroLiteral = """^[+-]?0*\.?0*(?:[eE][+-]?\d+)?$""".r
              .pattern.matcher(raw).matches
            val out = if (to == FloatType) d.toFloat.toDouble else d
            if (!zeroLiteral && (out == 0.0 || out.isInfinite))
              throw new ArithmeticException(
                s""""$raw" is out of range for type ${
                  if (to == FloatType) "real" else "double precision"}""")
            if (to == FloatType) d.toFloat else d
          }
        case (d: java.lang.Number, dt: DecimalType)
            if child.dataType == DoubleType || child.dataType == FloatType =>
          val dv = d.doubleValue
          if (dv.isNaN || dv.isInfinite) throw new ArithmeticException(
            "numeric field overflow")
          val dec = Decimal(dv)
          if (!dec.changePrecision(dt.precision, dt.scale))
            throw new ArithmeticException("numeric field overflow")
          // a nonzero double that ROUNDS to zero at this scale (1e-30 ->
          // numeric(38,18)) is a successful rescale in the reference
          // (CastFloat64ToNumeric only errors on invalid-operation /
          // precision overflow) — return the rounded zero
          dec
        case _ =>
          // shape the resolution rule shouldn't have routed here — fall
          // back to Spark's cast semantics
          org.apache.spark.sql.catalyst.expressions.Cast(
            Literal(v, child.dataType), to).eval(null)
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
  }

  /** pg `trunc(numeric[, scale])` / `trunc(float8)` (pg 9.3; reference
    * `src/expr/src/scalar/func.rs` TruncFloat64/TruncNumeric): truncate
    * TOWARD ZERO, keeping the argument's type family — Spark's `trunc`
    * is the date-truncation builtin, so the dialect shim routes here. */
  case class PgTrunc(child: Expression, scaleE: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(child, scaleE)
    override def dataType: DataType = child.dataType match {
      case FloatType => FloatType
      case d: DecimalType => d
      case ShortType | IntegerType | LongType |
           org.apache.spark.sql.types.ByteType => child.dataType
      case _ => DoubleType
    }
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val sRaw = scaleE.eval(input)
      if (sRaw == null) return null
      val s = sRaw match {
        case n: java.lang.Number => n.intValue
        case d: Decimal => d.toInt
        case o => o.toString.toDouble.toInt
      }
      v match {
        case d: java.lang.Double =>
          java.lang.Double.valueOf(new java.math.BigDecimal(d.doubleValue)
            .setScale(s, java.math.RoundingMode.DOWN).doubleValue)
        case f: java.lang.Float =>
          java.lang.Float.valueOf(new java.math.BigDecimal(f.doubleValue)
            .setScale(s, java.math.RoundingMode.DOWN).floatValue)
        case dec: Decimal =>
          val dt = dataType.asInstanceOf[DecimalType]
          Decimal(dec.toJavaBigDecimal
            .setScale(s, java.math.RoundingMode.DOWN)
            .setScale(dt.scale, java.math.RoundingMode.DOWN),
            dt.precision, dt.scale)
        case other => other // integral: trunc is the identity
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0), scaleE = newChildren(1))
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_trunc"),
      new ExpressionInfo(getClass.getName, "pg_trunc"),
      (args: Seq[Expression]) =>
        PgTrunc(args.head, args.lift(1).getOrElse(Literal(0)))),
    (new FunctionIdentifier("pg_ceil"),
      new ExpressionInfo(getClass.getName, "pg_ceil"),
      (args: Seq[Expression]) => PgFloatRound(args, up = true)),
    (new FunctionIdentifier("pg_floor"),
      new ExpressionInfo(getClass.getName, "pg_floor"),
      (args: Seq[Expression]) => PgFloatRound(args, up = false)),
    (new FunctionIdentifier("pg_sqrt"),
      new ExpressionInfo(getClass.getName, "pg_sqrt"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "sqrt")),
    (new FunctionIdentifier("pg_ln"),
      new ExpressionInfo(getClass.getName, "pg_ln"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "ln")),
    (new FunctionIdentifier("pg_sin"),
      new ExpressionInfo(getClass.getName, "pg_sin"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "sin")),
    (new FunctionIdentifier("pg_cos"),
      new ExpressionInfo(getClass.getName, "pg_cos"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "cos")),
    (new FunctionIdentifier("pg_tan"),
      new ExpressionInfo(getClass.getName, "pg_tan"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "tan")),
    (new FunctionIdentifier("pg_cot"),
      new ExpressionInfo(getClass.getName, "pg_cot"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "cot")),
    (new FunctionIdentifier("pg_asin"),
      new ExpressionInfo(getClass.getName, "pg_asin"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "asin")),
    (new FunctionIdentifier("pg_acos"),
      new ExpressionInfo(getClass.getName, "pg_acos"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "acos")),
    (new FunctionIdentifier("pg_atanh"),
      new ExpressionInfo(getClass.getName, "pg_atanh"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "atanh")),
    (new FunctionIdentifier("pg_acosh"),
      new ExpressionInfo(getClass.getName, "pg_acosh"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "acosh")),
    (new FunctionIdentifier("pg_exp"),
      new ExpressionInfo(getClass.getName, "pg_exp"),
      (args: Seq[Expression]) => PgCheckedMath(args.head, "exp")),
    (new FunctionIdentifier("pg_round"),
      new ExpressionInfo(getClass.getName, "pg_round"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) PgRound2(args(0), args(1))
        else Round(args.head, Literal(0))))
}
