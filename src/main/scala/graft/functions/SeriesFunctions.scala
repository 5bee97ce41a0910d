package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.types.{ArrayType, ByteType, CalendarIntervalType, DataType, DateType, DayTimeIntervalType, DecimalType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType, YearMonthIntervalType}

/** `generate_series(start, stop [, step])` — the reference's core table
  * function (`src/expr/src/relation/func.rs` TableFunc::GenerateSeriesInt64
  * / Timestamp; pg compatible). Spark-first mapping: `Explode(Sequence(...))`
  * — codegen'd, no UDF — registered BOTH as a scalar-position generator
  * (`SELECT generate_series(1, 3)`) and a FROM-position table function
  * (`FROM generate_series(1, 3)`).
  *
  * Semantics guard: pg returns the EMPTY set for start > stop with the
  * implicit +1 step, while Spark's 2-arg `sequence` auto-reverses. The
  * 2-arg form is therefore wrapped in `If(start <= stop, seq, empty)`
  * (the empty branch is `Slice(seq(start,start), 1, 0)` — an empty array of
  * the right element type). The 3-arg form goes through [[PgSeries]],
  * which dispatches on the resolved argument types. */
object SeriesFunctions {

  private def seriesArray(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) =>
      If(LessThanOrEqual(a, b), new Sequence(a, b),
        Slice(new Sequence(a, a), Literal(1), Literal(0)))
    case Seq(a, b, step) => PgSeries(a, b, step)
    case other => throw new IllegalArgumentException(
      s"generate_series expects 2 or 3 arguments, got ${other.length}")
  }

  val name = "generate_series"
  private val info = new ExpressionInfo(classOf[Sequence].getName, name)

  /** (identifier, info, builder) triples for SparkSessionExtensions. */
  def scalarFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info, (args: Seq[Expression]) => Explode(seriesArray(args)))

  def tableFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, (args: Seq[Expression]) =>
      // pg names an aliasless SRF's output column after the function
      // (`SELECT generate_series FROM generate_series(1, 3)`); Explode's
      // default is `col` — re-project under the pg name
      Project(
        Seq(Alias(UnresolvedAttribute("col"), name)()),
        Generate(Explode(seriesArray(args)), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Nil, child = OneRowRelation())))

  /** The un-exploded array form, for the SLT shim's multi-SRF lockstep
    * rewrite (`inline(arrays_zip(graft_series_array(..), ..))` — pg zips
    * SRFs in one select list, padding the shorter with NULLs, which is
    * exactly arrays_zip's semantics). */
  def arrayFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_series_array"), info, seriesArray _)

  // silence the unused warning if FunctionRegistry ends up unreferenced
  locally { val _ = FunctionRegistry }

  /** `FROM unnest(arr)` — pg's array-to-rows table function (reference
    * `src/expr/src/relation/func.rs` TableFunc::UnnestArray). pg flattens
    * ALL dimensions in row-major order (a 2-D array yields scalars), so the
    * argument goes through [[FlattenAll]] before Explode; the output column
    * carries pg's function name. */
  def unnestTableFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("unnest"),
      new ExpressionInfo(classOf[Explode].getName, "unnest"),
      (args: Seq[Expression]) => {
        // mz LISTS unnest ONE nesting level (a list-of-lists yields the
        // sublists — reference TableFunc::UnnestList), unlike pg arrays,
        // which flatten row-major to scalars; list-producing arguments are
        // recognizable by their marker expressions
        if (args.length != 1) throw new IllegalArgumentException(
          s"unnest expects 1 argument, got ${args.length}")
        args.head match {
          case Literal(null, org.apache.spark.sql.types.NullType) =>
            throw new IllegalArgumentException(
              "could not determine polymorphic type because input has type unknown")
          case _ => ()
        }
        val arg = args.head
        val isList = arg.exists(PgTypeof.isListExpr)
        val src = if (isList) arg else FlattenAll(arg)
        Project(
          Seq(Alias(UnresolvedAttribute("col"), "unnest")()),
          Generate(Explode(src), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Nil,
            child = OneRowRelation()))
      })
}

/** Flattens nested arrays to a single level of the innermost element type
  * (pg multi-dim arrays unnest row-major to scalars). A flat array passes
  * through unchanged; NULL sub-arrays contribute nothing. */
case class FlattenAll(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, DataType}
  private def innermost(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => innermost(e)
    case o => o
  }
  override def dataType: DataType = ArrayType(innermost(child.dataType))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def walk(a: Any, dt: DataType): Unit = dt match {
      case ArrayType(e, _) =>
        val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < ad.numElements) {
          if (ad.isNullAt(i)) { if (!e.isInstanceOf[ArrayType]) out += null }
          else walk(ad.get(i, e), e)
          i += 1
        }
      case _ => out += a
    }
    walk(v, child.dataType)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 3-arg `generate_series(start, stop, step)` with pg semantics, dispatching
  * on the RESOLVED argument types (a builder sees only unresolved args):
  *
  *  - integral series: pg returns the EMPTY set when the step points away
  *    from the stop, and handles spans wider than `Long.MaxValue`
  *    (`generate_series(-5e18, 5e18, 1e18)`), both of which make Spark's
  *    `sequence` throw (its length math is 64-bit). The replacement counts
  *    elements in DECIMAL(38,0) — `n = floor((stop-start)/step)` — and maps
  *    `sequence(0, n)` through `start + i*step` in decimal, so no
  *    intermediate overflows.
  *  - temporal series (interval step): delegates to Spark's `sequence`,
  *    wrapped in `TryEval` so a wrong-direction step degrades to the pg
  *    empty set (NULL array → Explode emits no rows) instead of throwing.
  *
  * RuntimeReplaceable: the optimizer's ReplaceExpressions swaps in
  * `replacement` AFTER analysis, so the tree below is built fully typed —
  * every comparison and arithmetic op pairs identical types. */
case class PgSeries(start: Expression, stop: Expression, stepE: Expression)
    extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(start, stop, stepE)

  override lazy val replacement: Expression = {
    val integral = children.forall(c =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(c.dataType))
    val temporal = Seq(start, stop).exists(c => c.dataType match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    })
    // the replacement bypasses ResolveTimeZone — Sequence is
    // TimeZoneAwareExpression and stays unresolved without an explicit id
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    if (temporal && !integral) {
      // pg iterates `cur := cur + step` (month-add clamps to month end at
      // EACH step: Jan 31 → Feb 28 → Mar 28), unlike Spark Sequence's
      // `start + i*step` (which would give Mar 31) — a dedicated iterative
      // expression, reference src/expr/src/relation/func.rs
      // GenerateSeriesTimestamp. The replacement tree sits outside the
      // analyzer's implicit-cast reach, so endpoint/step coercions
      // (date→timestamp, string step→interval text) are explicit here.
      val outT: DataType = Seq(start, stop).map(_.dataType).collectFirst {
        case t @ (TimestampType | TimestampNTZType) => t
      }.getOrElse(TimestampType)
      def ep(e: Expression): Expression =
        if (e.dataType == outT) e else Cast(e, outT, tz)
      // a step written `'1day'::interval` arrives as Cast(text, interval);
      // Spark's interval grammar NULLs on pg spellings like '1day' — feed
      // the raw text to the pg-grammar parser inside the expression instead
      val step = stepE match {
        case Cast(c, CalendarIntervalType, _, _) if c.dataType == StringType => c
        case e => e
      }
      GenerateSeriesTimestamp(ep(start), ep(stop), step)
    } else if (!integral) TryEval(Sequence(start, stop, Some(stepE), tz))
    else {
      val dec = DecimalType(38, 0)
      val aD = Cast(start, dec)
      val sD = Cast(stepE, dec)
      val n = Cast(Floor(Divide(Subtract(Cast(stop, dec), aD), sD)), LongType)
      // the replacement bypasses ResolveLambdaVariables, so the lambda var
      // must be pre-resolved (body references this exact instance)
      val i = NamedLambdaVariable("graft_gs_i", LongType, nullable = false)
      val mapped = ArrayTransform(
        Sequence(Literal(0L), n, None, tz),
        LambdaFunction(Cast(Add(aD, Multiply(Cast(i, dec), sD)), LongType), Seq(i)))
      val emptyArr = Slice(
        Sequence(Cast(start, LongType), Cast(start, LongType), None, tz),
        Literal(1), Literal(0))
      // And short-circuits, so the division inside `n` never runs on step=0
      If(
        And(Not(EqualTo(sD, Cast(Literal(0L), dec))),
          GreaterThanOrEqual(n, Literal(0L))),
        mapped, emptyArr)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), stop = newChildren(1), stepE = newChildren(2))
}

/** `generate_series(timestamp, timestamp, interval)` with pg's ITERATIVE
  * stepping (reference `src/expr/src/relation/func.rs:3566-3581`
  * TableFunc::GenerateSeriesTimestamp): each element is the previous plus
  * the step, so month arithmetic clamps to month-end at every hop
  * (`'2021-01-31' + '1 month'` → Feb 28 → Mar 28 → ...), where a
  * `start + i*step` formulation (Spark `Sequence`) would yield Mar 31.
  * Direction follows pg's interval sign (months flattened at 30 days);
  * a zero step raises pg's error; a step pointing away from `stop`
  * yields the empty set. The step accepts interval TEXT (this engine's
  * SLT dialect carries intervals as pg-canonical strings through
  * [[MzInterval]]) or any Spark interval type. */
case class GenerateSeriesTimestamp(start: Expression, stop: Expression, stepE: Expression)
    extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def first: Expression = start
  override def second: Expression = stop
  override def third: Expression = stepE
  override def prettyName: String = "generate_series"
  override def dataType: DataType = ArrayType(start.dataType, containsNull = false)
  override def nullable: Boolean = true

  private val MicrosPerDay = 86400000000L
  private val MaxElems = 16 * 1024 * 1024

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val (months, days, micros): (Long, Long, Long) = stepE.dataType match {
      case StringType =>
        MzInterval.parse(s.toString, None) match {
          case scala.util.Right(iv) => (iv.months, iv.days, iv.micros.toLong)
          case scala.util.Left(err) => throw new IllegalArgumentException(err)
        }
      case CalendarIntervalType =>
        val ci = s.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
        (ci.months.toLong, ci.days.toLong, ci.microseconds)
      case _: DayTimeIntervalType => (0L, 0L, s.asInstanceOf[Long])
      case _: YearMonthIntervalType => (s.asInstanceOf[Int].toLong, 0L, 0L)
      case other => throw new IllegalArgumentException(
        s"generate_series step must be an interval, got ${other.sql}")
    }
    // pg orders intervals by flattening months at 30 days (interval_cmp)
    val sign = java.lang.Long.signum(
      months * 30L * MicrosPerDay + days * MicrosPerDay + micros)
    if (sign == 0)
      throw new IllegalArgumentException("step size cannot equal zero")
    val stopM = b.asInstanceOf[Long]
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cur = a.asInstanceOf[Long]
    while (if (sign > 0) cur <= stopM else cur >= stopM) {
      buf += cur
      if (buf.size > MaxElems) throw new IllegalStateException(
        s"generate_series would produce more than $MaxElems rows")
      // timestamp + interval: months first (clamped), then days, then the
      // sub-day component — calendar arithmetic on the zoneless wall time
      // (session zone is UTC; TimestampNTZ micros share the representation)
      var ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(cur, 1000000L),
        (Math.floorMod(cur, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      ldt = ldt.plusMonths(months).plusDays(days)
        .plus(micros, java.time.temporal.ChronoUnit.MICROS)
      cur = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.toArray)
  }

  override protected def withNewChildrenInternal(
      f: Expression, sec: Expression, t: Expression): Expression =
    copy(start = f, stop = sec, stepE = t)
}
