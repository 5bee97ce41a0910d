package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level implementation shared by interpreted eval and generated code.
  * Scala object methods get static forwarders, so generated Java calls
  * `graft.functions.CryptoImpl.hmacSha256Hex(...)` directly. */
object CryptoImpl {
  private val macTL: ThreadLocal[javax.crypto.Mac] =
    ThreadLocal.withInitial(() => javax.crypto.Mac.getInstance("HmacSHA256"))

  def hmacSha256Hex(key: UTF8String, msg: UTF8String): UTF8String = {
    val mac = macTL.get()
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes, "HmacSHA256"))
    val out = mac.doFinal(msg.getBytes)
    val sb = new java.lang.StringBuilder(out.length * 2)
    out.foreach(b => sb.append(java.lang.String.format("%02x", Byte.box(b))))
    UTF8String.fromString(sb.toString)
  }
}

/** `hmac(key, message)` with SHA-256, hex output — the reference's HMAC
  * function (reference `src/expr/src/scalar/func/binary.rs:363-393`
  * digest/hmac family). A native Catalyst `Expression` with `doGenCode`:
  * stays inside whole-stage codegen (no UDF serialization, no codegen
  * fallback). */
case class HmacSha256Hex(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256"

  override protected def nullSafeEval(key: Any, msg: Any): Any =
    CryptoImpl.hmacSha256Hex(key.asInstanceOf[UTF8String], msg.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, m) => s"graft.functions.CryptoImpl.hmacSha256Hex($k, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HmacSha256Hex =
    copy(left = newLeft, right = newRight)
}

/** SQL-name registration so `expr("hmac_sha256(k, m)")` and `spark.sql`
  * resolve the expression like a built-in. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hmac_sha256"),
      new ExpressionInfo(classOf[HmacSha256Hex].getName, "hmac_sha256"),
      (args: Seq[Expression]) => HmacSha256Hex(args(0), args(1)))
  }
}
