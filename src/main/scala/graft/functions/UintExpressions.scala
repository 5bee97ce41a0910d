package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** The reference's unsigned integer types as CHECKED casts (reference
  * `SqlScalarType::{UInt16,UInt32,UInt64}`, `src/repr/src/scalar.rs`;
  * SURVEY §1.2 widening plan): Spark has no unsigned integers, so each
  * uintN cast widens to the next signed type that holds the full domain —
  * uint2 → int, uint4 → bigint, uint8 → decimal(20,0) — and range-checks
  * exactly like the reference's cast (negative or too-large inputs throw
  * `uintN out of range`). */
case class UintCast(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = bits match {
    case 2 => IntegerType
    case 4 => LongType
    case _ => DecimalType(20, 0)
  }
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable

  private val max: JBigDecimal = bits match {
    case 2 => new JBigDecimal(65535)
    case 4 => new JBigDecimal(4294967295L)
    case _ => new JBigDecimal("18446744073709551615")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = child.dataType match {
      case _: DecimalType =>
        input.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
      case _ =>
        try new JBigDecimal(input.toString.trim)
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"""invalid input syntax for type uint$bits: "$input"""")
        }
    }
    // pg/mz numeric→int casts round half away from zero
    val v = raw.setScale(0, RoundingMode.HALF_UP)
    if (v.signum < 0 || v.compareTo(max) > 0)
      throw new IllegalArgumentException(
        s""""${raw.stripTrailingZeros.toPlainString}" uint$bits out of range""")
    bits match {
      case 2 => v.intValueExact()
      case 4 => v.longValueExact()
      case _ => org.apache.spark.sql.types.Decimal(v, 20, 0)
    }
  }
  override protected def withNewChildInternal(c: Expression): UintCast = copy(child = c)
}

object UintFunctions {
  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(2, 4, 8).map { b =>
      (FunctionIdentifier(s"pg_uint$b"), info(s"pg_uint$b"),
        (a: Seq[Expression]) => UintCast(a.head, b): Expression)
    }
}
