package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** pg array TEXT input and dimension-retyping casts.
  *
  * pg array types do not encode dimensionality (`int[]` names *any* int
  * array), so `'{{1,2},{3,4}}'::int[]` is a 2-D value and
  * `ARRAY[ARRAY[]]::int[]` is legal. Spark's `ArrayType` is
  * dimension-typed, so both shapes fail native cast resolution. Two
  * recoveries (wired in [[graft.plans.ListTextCastRule]]):
  *
  *  - a FOLDABLE string cast to an array type parses at resolution time
  *    with pg `array_in` semantics (reference `src/repr/src/strconv.rs`
  *    parse_array): the literal's own brace nesting decides the Spark
  *    dimensionality, the declared type contributes only the LEAF type.
  *  - a nested-array value cast to a shallower array type keeps its
  *    dimensionality and re-types the leaves ([[PgArrayRetype]]).
  *
  * Both apply pg's zero-element normalization (reference
  * `src/repr/src/adt/array.rs`: an array with any zero dimension IS the
  * empty 0-dim array): a value with zero leaf elements collapses to the
  * empty top-level array, so `'{{}}'::int[]` renders `{}` and
  * `array_length(.., 1)` over it is NULL, exactly as pg.
  */
object PgArrayInput {

  private val BoundsPrefix = """^\s*(?:\[[^\]]*\])+\s*=""".r

  def leafOf(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => leafOf(e)
    case other => other
  }

  def depthOf(dt: DataType): Int = dt match {
    case ArrayType(e, _) => 1 + depthOf(e)
    case _ => 0
  }

  private def wrap(leaf: DataType, depth: Int): DataType =
    if (depth <= 0) leaf else ArrayType(wrap(leaf, depth - 1))

  /** Leaf converter: the mz list scalar converters plus the small-int and
    * decimal leaves pg array columns can declare. */
  private[functions] def conv(leaf: DataType): String => Any = leaf match {
    case ShortType => s =>
      try s.trim.toShort catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type smallint: "$s"""") }
    case d: DecimalType => s =>
      try org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(s.trim), d.precision, d.scale)
      catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"""invalid input syntax for type numeric: "$s"""") }
    case other => MzListExpressions.converter(other)
  }

  def countLeaves(v: Any, dt: DataType): Int = (v, dt) match {
    case (null, _) => 1
    case (a: ArrayData, ArrayType(e, _)) =>
      var n = 0
      var i = 0
      while (i < a.numElements()) {
        n += (if (a.isNullAt(i)) 1 else countLeaves(a.get(i, e), e))
        i += 1
      }
      n
    case _ => 1
  }

  /** Parse pg array input text against leaf type `leaf`; returns the
    * dimension-true Spark type and the Catalyst value. NULL text is the
    * caller's problem (cast of NULL stays NULL). */
  def parseTyped(text: String, leaf: DataType): (DataType, Any) = {
    // pg accepts an explicit bounds decoration `[l:u]...={...}`; the
    // bounds only shift subscripts (array_fill carries those through the
    // bounded-struct path) — for plain casts pg keeps the data
    val s = BoundsPrefix.replaceFirstIn(text, "")
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '{')
      throw new IllegalArgumentException(
        s"""malformed array literal: "$text"""")
    var depth = 0
    var j = i
    while (j < s.length && (s.charAt(j) == '{' || s.charAt(j).isWhitespace)) {
      if (s.charAt(j) == '{') depth += 1
      j += 1
    }
    if (depth == 0) depth = 1
    val value = MzListExpressions.parseList(s.substring(i), depth, conv(leaf))
    // pg ARRAY strictness (strconv.rs array parsing; lists stay lax):
    // max 6 dimensions, rectangular sub-arrays, no empty or NULL
    // sub-arrays inside a multidimensional literal
    if (depth > 6)
      throw new IllegalArgumentException(
        s"number of array dimensions ($depth) exceeds the maximum allowed (6)")
    def strict(v: Any, dt: DataType): Unit = (v, dt) match {
      case (a: ArrayData, ArrayType(e: ArrayType, _)) =>
        var expect = -1
        var k = 0
        while (k < a.numElements()) {
          if (a.isNullAt(k))
            throw new IllegalArgumentException(
              s"""invalid input syntax for type array: Unexpected array element.: "$text"""")
          val sub = a.get(k, e).asInstanceOf[ArrayData]
          if (sub.numElements() == 0)
            throw new IllegalArgumentException(
              s"""invalid input syntax for type array: Unexpected "}" character.: "$text"""")
          if (expect < 0) expect = sub.numElements()
          else if (sub.numElements() != expect)
            throw new IllegalArgumentException(
              "invalid input syntax for type array: Multidimensional " +
                s"""arrays must have sub-arrays with matching dimensions.: "$text"""")
          strict(sub, e)
          k += 1
        }
      case _ => ()
    }
    strict(value, wrap(leaf, depth))
    if (countLeaves(value, wrap(leaf, depth)) == 0)
      (ArrayType(leaf), new GenericArrayData(Array.empty[Any]))
    else (wrap(leaf, depth), value)
  }

  /** Cast a nested array value to the same shape with a new LEAF type —
    * pg `ARRAY[ARRAY[1.5]]::int[]` (dims preserved, pg float->int
    * rounding) — plus the zero-element normalization. */
  case class PgArrayRetype(child: Expression, leaf: DataType)
      extends UnaryExpression with CodegenFallback {
    private def retype(dt: DataType): DataType = dt match {
      case ArrayType(e, n) => ArrayType(retype(e), n)
      case _ => leaf
    }
    override lazy val dataType: DataType = retype(child.dataType)
    override def nullable: Boolean = true
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val srcLeaf = leafOf(child.dataType)
      checkLeafCast(srcLeaf)
      val out = MzListExpressions.roundConvert(v, child.dataType, dataType)
      if (countLeaves(out, dataType) == 0)
        new GenericArrayData(Array.empty[Any])
      else out
    }
    private def checkLeafCast(src: DataType): Unit = {
      val numeric = Set[DataType](ShortType, IntegerType, LongType,
        FloatType, DoubleType)
      val ok = src == leaf || src == NullType ||
        (numeric.contains(src) && numeric.contains(leaf)) ||
        src.isInstanceOf[DecimalType] && numeric.contains(leaf)
      if (!ok) throw new IllegalArgumentException(
        s"cannot cast type ${src.simpleString}[] to ${leaf.simpleString}[]")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
