package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine surface for [[MzInterval]]:
  *
  *  - `mz_interval(text, qualifier)` → the canonical pg-style interval text
  *    (reference `src/repr/src/adt/interval.rs` Display); throws the
  *    reference's `invalid input syntax for type interval: ...` on bad input.
  *  - `mz_interval_binop(op, a, qualA, b, qualB, negateB)` → componentwise
  *    checked +/− for the corpus' interval ± interval records.
  *
  * Both are constant-foldable scalar expressions — interval literals are
  * parse-time constants, so Catalyst folds the call to a literal and no
  * per-row work survives into the plan.
  */
object MzIntervalFunctions {

  case class MzIntervalCanon(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "mz_interval"
    override def eval(input: InternalRow): Any = {
      val t = left.eval(input)
      if (t == null) return null
      val q = right.eval(input)
      UTF8String.fromString(MzInterval.canonical(
        t.toString, if (q == null) "" else q.toString))
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class MzIntervalBinop(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def prettyName: String = "mz_interval_binop"
    override def eval(input: InternalRow): Any = {
      val v = children.map(_.eval(input))
      if (v.exists(_ == null)) return null
      UTF8String.fromString(MzInterval.binop(
        v(0).toString, v(1).toString, v(2).toString,
        v(3).toString, v(4).toString, v(5).toString == "true"))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class MzIntervalScale(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def prettyName: String = "mz_interval_scale"
    override def eval(input: InternalRow): Any = {
      val v = children.map(_.eval(input))
      if (v.exists(_ == null)) return null
      UTF8String.fromString(MzInterval.scale(
        v(0).toString, v(1).toString, v(2).toString, v(3).toString.toDouble))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class MzIntervalCmp(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def prettyName: String = "mz_interval_cmp"
    override def eval(input: InternalRow): Any = {
      val v = children.map(_.eval(input))
      if (v.exists(_ == null)) return null
      MzInterval.compare(v(0).toString, v(1).toString, v(2).toString,
        v(3).toString, v(4).toString)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** Generic 3-string-arg scalar over MzInterval helpers. */
  case class MzIntervalStr3(fn: (String, String, String) => String,
      name: String, children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def prettyName: String = name
    override def eval(input: InternalRow): Any = {
      val v = children.map(_.eval(input))
      if (v.exists(_ == null)) return null
      UTF8String.fromString(fn(v(0).toString, v(1).toString, v(2).toString))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** pg age(t1, t2) → canonical interval text. */
  case class MzAge(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "age"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      UTF8String.fromString(MzInterval.render(
        MzInterval.age(a.asInstanceOf[Long], b.asInstanceOf[Long])))
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("age"),
      new ExpressionInfo(getClass.getName, "age"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) =>
          import org.apache.spark.sql.catalyst.expressions.Cast
          import org.apache.spark.sql.types.TimestampType
          MzAge(Cast(a, TimestampType), Cast(b, TimestampType))
        case other => throw new IllegalArgumentException(
          s"age expects (timestamp, timestamp), got ${other.length} args")
      }),
    (new FunctionIdentifier("mz_interval_justify"),
      new ExpressionInfo(getClass.getName, "mz_interval_justify"),
      (args: Seq[Expression]) =>
        if (args.length == 3) MzIntervalStr3(MzInterval.justify, "mz_interval_justify", args)
        else throw new IllegalArgumentException("mz_interval_justify expects 3 args")),
    (new FunctionIdentifier("mz_interval_extract"),
      new ExpressionInfo(getClass.getName, "mz_interval_extract"),
      (args: Seq[Expression]) =>
        if (args.length == 3) MzIntervalStr3(MzInterval.extract, "mz_interval_extract", args)
        else throw new IllegalArgumentException("mz_interval_extract expects 3 args")),
    (new FunctionIdentifier("mz_interval_cmp"),
      new ExpressionInfo(getClass.getName, "mz_interval_cmp"),
      (args: Seq[Expression]) =>
        if (args.length == 5) MzIntervalCmp(args)
        else throw new IllegalArgumentException(
          s"mz_interval_cmp expects 5 args, got ${args.length}")),
    (new FunctionIdentifier("mz_interval_scale"),
      new ExpressionInfo(getClass.getName, "mz_interval_scale"),
      (args: Seq[Expression]) =>
        if (args.length == 4) MzIntervalScale(args)
        else throw new IllegalArgumentException(
          s"mz_interval_scale expects 4 args, got ${args.length}")),
    (new FunctionIdentifier("mz_interval"),
      new ExpressionInfo(getClass.getName, "mz_interval"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MzIntervalCanon(t,
          org.apache.spark.sql.catalyst.expressions.Literal(""))
        case Seq(t, q) => MzIntervalCanon(t, q)
        case other => throw new IllegalArgumentException(
          s"mz_interval expects (text[, qualifier]), got ${other.length} args")
      }),
    (new FunctionIdentifier("mz_interval_binop"),
      new ExpressionInfo(getClass.getName, "mz_interval_binop"),
      (args: Seq[Expression]) =>
        if (args.length == 6) MzIntervalBinop(args)
        else throw new IllegalArgumentException(
          s"mz_interval_binop expects 6 args, got ${args.length}")))
}
