package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, LeafExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Session identity constants, mz spellings (reference
  * `src/sql/src/func.rs`: current_database/current_catalog return the
  * session database, current_user/session_user the role — both default to
  * `materialize` in the reference's single-binary deployment;
  * `doc/user/content/sql/functions`). Overrides Spark's `default`/OS-user
  * answers so the catalog surface reads like the reference's. */
object SessionIdentity {

  private def const(name: String, value: String) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, name),
      (_: Seq[Expression]) => Literal(value): Expression)

  /** `mz_now()` as a VALUE (reference unmaterializable MzNow,
    * `src/expr/src/scalar/func/unmaterializable.rs:35-56`): the logical
    * query timestamp in milliseconds, substituted at execution like the
    * reference's one-shot `ExprPrepOneShot`. Honors the per-statement pin
    * `spark.graft.mz_now` (the temporal-view path sets it); otherwise the
    * wall clock. Temporal FILTERS never reach this expression —
    * [[graft.sql.TemporalSql]] extracts `mz_now()` conjuncts from the
    * unresolved plan first. */
  case class MzNowExpression() extends LeafExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "mz_now"
    override lazy val deterministic: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.mz_now", "") match {
        case "" => System.currentTimeMillis()
        case pinned if pinned.forall(_.isDigit) => pinned.toLong
        case pinned => // temporal-view fixture pin: a timestamp string
          java.sql.Timestamp.valueOf(pinned).getTime
      }
  }

  /** `mz_sleep(seconds)` argument validation (reference
    * `src/expr/src/scalar/func/impls/float64.rs` Sleep): negative, NaN,
    * infinite, and overflow durations raise; a valid duration returns
    * NULL WITHOUT waiting — every read here is already at the latest
    * timestamp, so the catch-up wait the corpus uses it for is a no-op. */
  case class MzSleepExpression(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.NullType
    override def nullable: Boolean = true
    override def prettyName: String = "mz_sleep"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val d = v match {
        case n: java.lang.Number => n.doubleValue
        case other => other.toString.toDouble
      }
      def render: String =
        if (d.isNaN) "NaN"
        else if (d.isInfinite) "Infinity"
        else if (d == d.longValue.toDouble && math.abs(d) < 1e15) d.longValue.toString
        else d.toString.replace("E", "e+").replace("e+-", "e-")
      if (d.isNaN || d.isInfinite || d < 0 || d > 2147483647.0)
        throw new ArithmeticException(s"cannot sleep for $render seconds")
      null
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    const("current_database", "materialize"),
    const("current_catalog", "materialize"),
    const("current_user", "materialize"),
    const("session_user", "materialize"),
    const("user", "materialize"),
    (new FunctionIdentifier("mz_now"),
      new ExpressionInfo(getClass.getName, "mz_now"),
      (_: Seq[Expression]) => MzNowExpression()),
    // mz_unsafe.mz_sleep(n): sleeps n seconds, returns NULL — in this
    // synchronous engine every read is already at the latest timestamp,
    // so the timing wait is a semantic no-op (the corpus uses it to let
    // async dataflows catch up); argument validation stays real
    (new FunctionIdentifier("mz_sleep"),
      new ExpressionInfo(getClass.getName, "mz_sleep"),
      (args: Seq[Expression]) => MzSleepExpression(args.head)))
}
