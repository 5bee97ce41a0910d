package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** pg/mz `array_fill(value, dims[, lower_bounds])` (reference
  * `src/expr/src/scalar/func/variadic.rs` ArrayFill; corpus
  * `test/sqllogictest/array_fill.slt`).
  *
  * Spark-first representation: the 2-arg form (all lower bounds 1, pg's
  * default) is a PLAIN nested Spark array — every existing array operator
  * (subscript, ||, array_length, unnest, render) composes for free. The
  * 3-arg form carries its lower bounds IN THE TYPE as
  * `struct(graft_lb: array<int>, data: array<..>)`, so the bounds survive
  * aliases and subqueries without analysis-time marker tracking;
  * [[PgSubscriptN]] / [[PgArrayDim]] / [[GraftBoundedCat]] and the SLT
  * result renderer detect the struct shape and apply pg's
  * bounds-shifted semantics.
  *
  * Dimension/lower-bound arguments must be foldable (pg callers pass
  * literals; the DIMENSIONALITY must be known at plan time to produce a
  * static Spark type — the same restriction Spark's own `array_repeat`
  * nesting has).
  */
case class GraftArrayFill(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private def value = children.head
  private def dimsE = children(1)
  private def lbE: Option[Expression] = children.drop(2).headOption

  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  /** The bounded-array struct field names — the contract shared with the
    * subscript/dim/concat expressions and the SLT renderer. */
  import GraftArrayFill.{LB_FIELD, DATA_FIELD}

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 2 || children.length > 3)
      return TypeCheckResult.TypeCheckFailure(
        s"array_fill expects 2 or 3 arguments, got ${children.length}")
    value.dataType match {
      case NullType => return TypeCheckResult.TypeCheckFailure(
        "could not determine polymorphic type because input has type unknown")
      case _: ArrayType => return TypeCheckResult.TypeCheckFailure(
        "array_fill with arrays not yet supported")
      case _: MapType => return TypeCheckResult.TypeCheckFailure(
        s"array_fill on map not yet supported")
      case _ => ()
    }
    if (!dimsE.foldable || !lbE.forall(_.foldable))
      return TypeCheckResult.TypeCheckFailure(
        "array_fill dimension arguments must be constants")
    TypeCheckResult.TypeCheckSuccess
  }

  /** Number of dimensions, read from the folded dims literal; 1 when the
    * dims argument is NULL or malformed (eval raises pg's error then). */
  private lazy val ndims: Int = try {
    dimsE.eval(InternalRow.empty) match {
      case a: ArrayData if flatIntArray(dimsE.dataType) => a.numElements()
      case _ => 1
    }
  } catch { case _: Exception => 1 }

  private def flatIntArray(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => !et.isInstanceOf[ArrayType]
    case _ => false
  }

  private lazy val nestedType: DataType =
    (1 to math.max(ndims, 1)).foldLeft(value.dataType) {
      case (t, _) => ArrayType(t, containsNull = true)
    }

  override def dataType: DataType =
    if (lbE.isEmpty) nestedType
    else StructType(Seq(
      StructField(LB_FIELD, ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField(DATA_FIELD, nestedType, nullable = false)))

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Reads a dims/lb argument as Seq[Int], raising pg's errors. */
  private def readIntVector(e: Expression, input: InternalRow): Seq[Int] = {
    if (!flatIntArray(e.dataType))
      err("wrong number of array subscripts")
    val v = e.eval(input)
    if (v == null) err("dimension array or low bound array must not be null")
    val a = v.asInstanceOf[ArrayData]
    val et = e.dataType.asInstanceOf[ArrayType].elementType
    (0 until a.numElements()).map { i =>
      if (a.isNullAt(i)) err("dimension values must not be null")
      et match {
        case IntegerType => a.getInt(i)
        case LongType => a.getLong(i).toInt
        case ShortType => a.getShort(i).toInt
        case ByteType => a.getByte(i).toInt
        case _ => err("wrong number of array subscripts")
      }
    }
  }

  override def eval(input: InternalRow): Any = {
    val dims = readIntVector(dimsE, input)
    val lb = lbE.map(readIntVector(_, input))
    lb.foreach { l =>
      if (l.length != dims.length) err("wrong number of array subscripts")
    }
    if (dims.length > 6)
      err(s"number of array dimensions (${dims.length}) exceeds the maximum allowed (6)")
    // total size check in BYTES, the reference's (1<<28)-1 datum limit
    val elemBytes = value.dataType match {
      case BooleanType => 1L
      case _ => 8L
    }
    val product = dims.foldLeft(1L)((acc, d) => acc * d)
    if (dims.exists(_ < 0) || product * elemBytes + 20L > 268435455L)
      err("array size exceeds the maximum allowed (268435455 bytes)")
    val v = value.eval(input)
    val data: Any =
      if (dims.isEmpty || product == 0L)
        // pg collapses any zero dimension to the zero-dim empty array
        new GenericArrayData(Array.empty[Any])
      else {
        def build(level: Int): Any =
          if (level == dims.length - 1)
            new GenericArrayData(Array.fill[Any](dims(level))(v))
          else {
            val inner = build(level + 1)
            new GenericArrayData(Array.fill[Any](dims(level))(inner))
          }
        build(0)
      }
    lb match {
      case None => data
      case Some(l) =>
        InternalRow(new GenericArrayData(l.toArray[Any]), data)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object GraftArrayFill {
  val LB_FIELD = "graft_lb"
  val DATA_FIELD = "graft_arr_data"

  /** Is `dt` the bounded-array struct this family produces? */
  def boundedType(dt: DataType): Option[(ArrayType, StructType)] = dt match {
    case st: StructType if st.fields.length == 2 &&
        st.fields(0).name == LB_FIELD && st.fields(1).name == DATA_FIELD &&
        st.fields(1).dataType.isInstanceOf[ArrayType] =>
      Some((st.fields(1).dataType.asInstanceOf[ArrayType], st))
    case _ => None
  }

  /** Static dims/lower-bounds of a bounded value: (lb, data). */
  def unpack(row: InternalRow): (Seq[Int], ArrayData) = {
    val lbA = row.getArray(0)
    ((0 until lbA.numElements()).map(lbA.getInt), row.getArray(1))
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_fill"),
      new ExpressionInfo(classOf[GraftArrayFill].getName, "array_fill"),
      (args: Seq[Expression]) => GraftArrayFill(args)))
}

/** pg `array || array` over bounds-carrying arrays (corpus
  * array_fill.slt "Concatenating arrays"): same-dimensionality concat
  * keeps the LHS bounds over the summed outer extent; an (N-1)-D operand
  * appends/prepends as one element of the N-D side, keeping that side's
  * bounds; inner extents must agree. Plain arrays participate as
  * all-lower-bound-1 values. */
case class GraftBoundedCat(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true

  private def sideInfo(e: Expression): (ArrayType, Boolean) =
    GraftArrayFill.boundedType(e.dataType) match {
      case Some((at, _)) => (at, true)
      case None => (e.dataType.asInstanceOf[ArrayType], false)
    }

  private def depth(dt: DataType): Int = dt match {
    case ArrayType(et, _) => 1 + depth(et)
    case _ => 0
  }

  private lazy val (lAt, lBounded) = sideInfo(left)
  private lazy val (rAt, rBounded) = sideInfo(right)
  private lazy val lDepth = depth(lAt)
  private lazy val rDepth = depth(rAt)
  private lazy val outAt: ArrayType = if (lDepth >= rDepth) lAt else rAt

  override def checkInputDataTypes(): TypeCheckResult =
    if (math.abs(lDepth - rDepth) > 1 || lDepth == 0 || rDepth == 0)
      TypeCheckResult.TypeCheckFailure("cannot concatenate incompatible arrays")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField(GraftArrayFill.LB_FIELD, ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField(GraftArrayFill.DATA_FIELD, outAt, nullable = false)))

  private def err(): Nothing =
    throw new IllegalArgumentException("cannot concatenate incompatible arrays")

  /** Per-level extents of a nested array (rectangular, pg semantics). */
  private def extents(a: ArrayData, dt: ArrayType): Seq[Int] = {
    val n = a.numElements()
    dt.elementType match {
      case inner: ArrayType =>
        if (n == 0 || a.isNullAt(0)) Seq(n)
        else n +: extents(a.getArray(0), inner)
      case _ => Seq(n)
    }
  }

  override def eval(input: InternalRow): Any = {
    val lv0 = left.eval(input)
    val rv0 = right.eval(input)
    if (lv0 == null || rv0 == null) return null
    def split(v: Any, bounded: Boolean, at: ArrayType): (Seq[Int], ArrayData) =
      if (bounded) GraftArrayFill.unpack(v.asInstanceOf[InternalRow])
      else {
        val a = v.asInstanceOf[ArrayData]
        (Seq.fill(depth(at))(1), a)
      }
    val (llb, la) = split(lv0, lBounded, lAt)
    val (rlb, ra) = split(rv0, rBounded, rAt)
    val lExt = extents(la, lAt)
    val rExt = extents(ra, rAt)
    val all = (0 until la.numElements()).map(i =>
      if (la.isNullAt(i)) null else la.get(i, lAt.elementType))
    val allR = (0 until ra.numElements()).map(i =>
      if (ra.isNullAt(i)) null else ra.get(i, rAt.elementType))
    val (lb, items): (Seq[Int], Seq[Any]) =
      if (lDepth == rDepth) {
        if (lExt.drop(1) != rExt.drop(1)) err()
        (llb, all ++ allR)
      } else if (rDepth == lDepth - 1) {
        // RHS is one ELEMENT of LHS
        if (lExt.drop(1) != rExt) err()
        (llb, all :+ (ra: Any))
      } else {
        // LHS is one element of RHS
        if (rExt.drop(1) != lExt) err()
        (rlb, (la: Any) +: allR)
      }
    InternalRow(
      new GenericArrayData(lb.toArray[Any]),
      new GenericArrayData(items.toArray))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
