package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

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
    // the replacement bypasses ResolveTimeZone — Sequence is
    // TimeZoneAwareExpression and stays unresolved without an explicit id
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    if (!integral) TryEval(Sequence(start, stop, Some(stepE), tz))
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
