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

/** pg pgcrypto `digest(data, type) -> bytea` and `hmac(data, key, type) ->
  * bytea` (reference `src/expr/src/scalar/func.rs` DigestString/DigestBytes/
  * HmacString/HmacBytes; pgcrypto). Supported types mirror pgcrypto:
  * md5, sha1, sha224, sha256, sha384, sha512. */
object PgCryptoFunctions {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  import org.apache.spark.sql.types.BinaryType

  private def algoFor(t: String): String = t.toLowerCase match {
    case "md5" => "MD5"
    case "sha1" => "SHA-1"
    case "sha224" => "SHA-224"
    case "sha256" => "SHA-256"
    case "sha384" => "SHA-384"
    case "sha512" => "SHA-512"
    case other =>
      throw new IllegalArgumentException(s"Cannot construct digest with type: $other")
  }

  /** pg bytea input conversion for text arguments in a bytea position: a
    * leading `\x` selects the hex input format (pg datatype-binary docs);
    * other text passes through as its UTF-8 bytes. */
  private[functions] def toBytes(v: Any): Array[Byte] = bytesOf(v)

  private def bytesOf(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case other =>
      val s = other.toString
      if (s.startsWith("\\x") && s.length % 2 == 0 &&
          s.drop(2).forall(c => Character.digit(c, 16) >= 0)) {
        val hx = s.drop(2)
        Array.tabulate(hx.length / 2)(i =>
          ((Character.digit(hx(2 * i), 16) << 4) |
            Character.digit(hx(2 * i + 1), 16)).toByte)
      } else s.getBytes("UTF-8")
  }

  case class PgDigest(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val data = children(0).eval(input)
      val ty = children(1).eval(input)
      if (data == null || ty == null) return null
      java.security.MessageDigest.getInstance(algoFor(ty.toString))
        .digest(bytesOf(data))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class PgHmac(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val data = children(0).eval(input)
      val key = children(1).eval(input)
      val ty = children(2).eval(input)
      if (data == null || key == null || ty == null) return null
      val macName = algoFor(ty.toString) match {
        case "MD5" => "HmacMD5"
        case a => "Hmac" + a.replace("-", "")
      }
      val mac = javax.crypto.Mac.getInstance(macName)
      mac.init(new javax.crypto.spec.SecretKeySpec(bytesOf(key), macName))
      mac.doFinal(bytesOf(data))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("digest"),
      new ExpressionInfo(classOf[PgDigest].getName, "digest"),
      (args: Seq[Expression]) =>
        if (args.length == 2) PgDigest(args)
        else throw new IllegalArgumentException(
          s"digest expects (data, type), got ${args.length}")),
    (new FunctionIdentifier("hmac"),
      new ExpressionInfo(classOf[PgHmac].getName, "hmac"),
      (args: Seq[Expression]) =>
        if (args.length == 3) PgHmac(args)
        else throw new IllegalArgumentException(
          s"hmac expects (data, key, type), got ${args.length}")))
}
