package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    const("current_database", "materialize"),
    const("current_catalog", "materialize"),
    const("current_user", "materialize"),
    const("session_user", "materialize"),
    const("user", "materialize"))
}
