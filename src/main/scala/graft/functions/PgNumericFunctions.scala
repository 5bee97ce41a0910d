package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

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

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_ceil"),
      new ExpressionInfo(getClass.getName, "pg_ceil"),
      (args: Seq[Expression]) => PgFloatRound(args, up = true)),
    (new FunctionIdentifier("pg_floor"),
      new ExpressionInfo(getClass.getName, "pg_floor"),
      (args: Seq[Expression]) => PgFloatRound(args, up = false)))
}
