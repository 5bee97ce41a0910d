package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Round}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DoubleType, FloatType}

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

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
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
    (new FunctionIdentifier("pg_round"),
      new ExpressionInfo(getClass.getName, "pg_round"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) PgRound2(args(0), args(1))
        else Round(args.head, Literal(0))))
}
