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
        case pinned => pinned.toLong
      }
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    const("current_database", "materialize"),
    const("current_catalog", "materialize"),
    const("current_user", "materialize"),
    const("session_user", "materialize"),
    const("user", "materialize"),
    (new FunctionIdentifier("mz_now"),
      new ExpressionInfo(getClass.getName, "mz_now"),
      (_: Seq[Expression]) => MzNowExpression()))
}
