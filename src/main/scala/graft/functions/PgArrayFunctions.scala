package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, NullType}
import org.apache.spark.unsafe.types.UTF8String

/** pg-semantic array accessors (reference `src/expr/src/scalar/func.rs`
  * array_index / array_remove / array_position; pg array semantics):
  *
  *  - `pg_subscript(arr, i)` — 1-based subscript returning NULL for a NULL,
  *    zero, negative, or out-of-bounds index (pg `arr[i]`; Spark's native
  *    `[]` is 0-based and ANSI-errors out of bounds). The SLT shim rewrites
  *    pg subscript syntax to this function.
  *  - `array_remove(arr, e)` — removes elements NOT DISTINCT FROM `e`
  *    (so `array_remove(a, NULL)` strips NULLs, which Spark's builtin
  *    returns NULL for), keeping all others including NULLs.
  *  - `array_position(arr, e)` — NULL (not 0) when the element is absent.
  *
  * All are pure Catalyst expression trees (If/ElementAt/ArrayFilter) —
  * codegen'd, no UDFs. Registered via SparkSessionExtensions, overriding
  * the Spark builtins of the same name where one exists.
  */
/** pg array_upper/array_lower/array_length with real multi-dimension
  * support: dim k descends k-1 levels into nested arrays (pg arrays are
  * rectangular, so the first element's size is the dimension's extent).
  * NULL for empty arrays, out-of-range dims, or non-array levels — exactly
  * pg. CodegenFallback: dialect-compat surface. */
case class PgArrayDim(left: Expression, right: Expression, kind: String)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == NullType)
      // pg rejects a bare untyped NULL argument (polymorphic anyarray)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "could not determine polymorphic type because input has type unknown")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override protected def nullSafeEval(arr: Any, dim: Any): Any = {
    val d = dim.asInstanceOf[Int]
    if (d < 1) return null
    // bounds-carrying arrays (array_fill with explicit lower bounds): the
    // bound vector rides in the struct value; lower/upper shift by it
    val (arr0, dt0, lbs) = GraftArrayFill.boundedType(left.dataType) match {
      case Some((at, _)) =>
        val (lb, data) = GraftArrayFill.unpack(
          arr.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        (data, at, lb)
      case None =>
        (arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
          left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType],
          Seq.empty[Int])
    }
    var cur = arr0
    var dt = dt0
    var level = 1
    while (level < d) {
      if (cur.numElements == 0) return null
      dt.elementType match {
        case inner: org.apache.spark.sql.types.ArrayType =>
          if (cur.isNullAt(0)) return null
          cur = cur.getArray(0)
          dt = inner
          level += 1
        case _ => return null
      }
    }
    val lo = lbs.applyOrElse(d - 1, (_: Int) => 1)
    if (cur.numElements == 0) null
    else if (kind == "lower") lo
    else if (kind == "upper") lo + cur.numElements - 1
    else cur.numElements
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PgArrayDim =
    copy(left = l, right = r)
}

/** pg N-dimensional array subscripting: `a[i][j]...` applies as ONE
  * operation (pg array semantics; the SLT shim flattens chained subscripts
  * into one call). Rules: 1-based, NULL for a NULL / fractional /
  * out-of-bounds index, and NULL when the access is UNDER-indexed (fewer
  * subscripts than dimensions — pg yields NULL for `a[2]` on a 2-D array,
  * since array elements are never themselves arrays in pg). */
case class PgSubscriptN(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private def arr = children.head
  private def idxs = children.tail
  private def peel(dt: org.apache.spark.sql.types.DataType, n: Int):
      org.apache.spark.sql.types.DataType =
    if (n == 0) dt else dt match {
      case org.apache.spark.sql.types.ArrayType(et, _) => peel(et, n - 1)
      case other => other
    }
  /** Bounds-carrying arrays (array_fill with lower bounds) subscript on
    * their data with indexes shifted by the bound vector. */
  private def boundedBase: Option[org.apache.spark.sql.types.ArrayType] =
    GraftArrayFill.boundedType(arr.dataType).map(_._1)
  override def dataType: org.apache.spark.sql.types.DataType =
    peel(boundedBase.getOrElse(arr.dataType), idxs.length)
  override def nullable: Boolean = true
  /** pg 14 jsonb subscripting (`('[1,2]'::jsonb)[0]`, 0-based, negative
    * wraps, text keys coerce to array indexes) — the engine stores jsonb as
    * canonical text, so a string-typed operand takes this path. */
  private def evalJsonb(input: org.apache.spark.sql.catalyst.InternalRow,
      root: Any): Any = {
    var node = try JsonbValue.parse(root.toString) catch { case _: Throwable => return null }
    idxs.foreach { idxe =>
      val raw = idxe.eval(input)
      if (raw == null) return null
      val isText = idxe.dataType == org.apache.spark.sql.types.StringType
      val keyText = raw.toString
      if (node.isArray) {
        val i0 =
          if (keyText.matches("-?\\d+")) keyText.toInt
          else return null
        val i = if (i0 < 0) node.size + i0 else i0
        if (i < 0 || i >= node.size) return null
        node = node.get(i)
      } else if (node.isObject && isText) {
        val n = node.get(keyText)
        if (n == null) return null
        node = n
      } else return null
    }
    UTF8String.fromString(JsonbValue.render(node))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (arr.dataType == org.apache.spark.sql.types.StringType) {
      val root = arr.eval(input)
      return if (root == null) null else evalJsonb(input, root)
    }
    // under-indexed multi-dim access is NULL regardless of the indices
    if (dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) return null
    var cur = arr.eval(input)
    var dt = arr.dataType
    var lbs: Seq[Int] = Seq.empty
    if (cur != null) boundedBase.foreach { at =>
      val (lb, data) = GraftArrayFill.unpack(
        cur.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      cur = data; dt = at; lbs = lb
    }
    var level = 0
    idxs.foreach { idxe =>
      if (cur == null) return null
      val et = dt match {
        case org.apache.spark.sql.types.ArrayType(e, _) => e
        case _ => return null // over-indexed: subscripting a non-array
      }
      val raw = idxe.eval(input)
      if (raw == null) return null
      val d = raw match {
        case n: Number => n.doubleValue
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => try other.toString.toDouble catch { case _: Throwable => return null }
      }
      val i0 = d.toInt
      if (i0.toDouble != d) return null // fractional subscript
      // a lower-bound vector shifts the pg index into 1-based storage
      val i = i0 - lbs.applyOrElse(level, (_: Int) => 1) + 1
      val a = cur.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (i < 1 || i > a.numElements) return null
      cur = if (a.isNullAt(i - 1)) null else a.get(i - 1, et)
      dt = et
      level += 1
    }
    cur
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PgArrayFunctions {

  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  /** int2vector values (canonical space-joined text) as their int2[]
    * form; pg subscripts int2vector from ZERO, so callers shift. */
  private def iv2arr(e: Expression): Expression = {
    val f = UnresolvedNamedLambdaVariable(Seq("graft_iva_f"))
    val t = UnresolvedNamedLambdaVariable(Seq("graft_iva_t"))
    ArrayTransform(
      ArrayFilter(
        org.apache.spark.sql.catalyst.expressions.StringSplit(
          e, Literal(" "), Literal(-1)),
        LambdaFunction(Not(EqualTo(f, Literal(""))), Seq(f))),
      LambdaFunction(Cast(t, org.apache.spark.sql.types.ShortType), Seq(t)))
  }

  private def pgSubscript(args: Seq[Expression]): Expression = args match {
    case Seq(iv: PgInt2Vector, idx) => // 0-based int2vector subscript
      PgSubscriptN(Seq(iv2arr(iv),
        org.apache.spark.sql.catalyst.expressions.Add(
          Cast(idx, IntegerType), Literal(1))))
    case s if s.length >= 2 => PgSubscriptN(s)
    case other => throw new IllegalArgumentException(
      s"pg_subscript expects (array, index...), got ${other.length} args")
  }

  private def arrayRemove(args: Seq[Expression]): Expression = args match {
    case Seq(arr, elem) =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_ar_x"))
      ArrayFilter(arr, LambdaFunction(Not(EqualNullSafe(x, elem)), Seq(x)))
    case other => throw new IllegalArgumentException(
      s"array_remove expects (array, element), got ${other.length} args")
  }

  /** pg: array_position searches LINEARLY and rejects multidimensional
    * inputs ("searching for elements in multidimensional arrays is not
    * supported", pg array_funcs.c array_position). Transparent value
    * passthrough; the typecheck is the whole point. */
  case class PgNoMultidim(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.ArrayType(
            _: org.apache.spark.sql.types.ArrayType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "searching for elements in multidimensional arrays is not supported")
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def arrayPosition(args: Seq[Expression]): Expression = args match {
    case Seq(arr0, elem) =>
      val arr = PgNoMultidim(arr0)
      val p = ArrayPosition(arr, elem)
      If(EqualTo(p, Literal(0L)), Literal.create(null, NullType), p)
    case Seq(arr0, elem, from) =>
      val arr = PgNoMultidim(arr0)
      def isNullLit(e: Expression): Boolean = e match {
        case Literal(null, _) => true
        case Cast(c, _, _, _) => isNullLit(c)
        case _ => false
      }
      // pg: "initial position must not be null" — but a NULL array or
      // NULL element short-circuits to NULL first (strict eval order)
      from match {
        case Literal(null, _) if !isNullLit(arr0) && !isNullLit(elem) =>
          throw new IllegalArgumentException(
            "initial position must not be null")
        case _ => ()
      }
      // pg 3-arg form: first match at-or-after `from` (a sub-1 start scans
      // the whole array, matching the reference corpus expectations)
      val start = Greatest(Seq(Cast(from, IntegerType), Literal(1)))
      val p = ArrayPosition(Slice(arr, start, Size(arr)), elem)
      If(
        EqualTo(p, Literal(0L)),
        Literal.create(null, NullType),
        Add(p, Cast(Subtract(start, Literal(1)), org.apache.spark.sql.types.LongType)))
    case other => throw new IllegalArgumentException(
      s"array_position expects (array, element[, start]), got ${other.length} args")
  }

  private def arrayCat(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) =>
      // pg array_cat returns the other operand when one is NULL (Spark's
      // concat returns NULL)
      If(IsNull(a), b, If(IsNull(b), a, Concat(Seq(a, b))))
    case other => throw new IllegalArgumentException(
      s"array_cat expects (array, array), got ${other.length} args")
  }

  private def arrayDim(args: Seq[Expression], kind: String): Expression = args match {
    case Seq(iv: PgInt2Vector, dim) =>
      PgArrayDim(iv2arr(iv), Cast(dim, IntegerType), kind)
    case Seq(arr, dim) => PgArrayDim(arr, Cast(dim, IntegerType), kind)
    case other => throw new IllegalArgumentException(
      s"array_$kind expects (array, dim), got ${other.length} args")
  }

  /** (identifier, info, builder) triples for SparkSessionExtensions. */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("pg_subscript"), info("pg_subscript"), pgSubscript _),
      (FunctionIdentifier("array_remove"), info("array_remove"), arrayRemove _),
      (FunctionIdentifier("array_position"), info("array_position"), arrayPosition _),
      (FunctionIdentifier("array_upper"), info("array_upper"),
        (a: Seq[Expression]) => arrayDim(a, "upper")),
      (FunctionIdentifier("array_lower"), info("array_lower"),
        (a: Seq[Expression]) => arrayDim(a, "lower")),
      (FunctionIdentifier("array_length"), info("array_length"),
        (a: Seq[Expression]) => arrayDim(a, "length")),
      (FunctionIdentifier("array_cat"), info("array_cat"), arrayCat _))
}
