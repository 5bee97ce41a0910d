package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg's `format_type(oid, typmod)` as the reference implements it
  * (`src/pgrepr/src/types.rs` name(), `src/sql/src/func.rs` format_type;
  * corpus `test/sqllogictest/types.slt:601-780`):
  *
  *  - NULL oid → NULL; an oid the catalog doesn't know → `'???'` (pg errors
  *    here, the reference answers `???` — we follow the reference).
  *  - typmod is rendered for the types that carry one: timestamps/time get
  *    `(p)` precision when typmod >= 0, char/varchar get `(typmod - 4)`,
  *    numeric unpacks `((typmod - 4) >> 16, (typmod - 4) & 0xffff)`.
  *  - Array types render as `<element>[]` (pg's internal `_name` convention).
  *
  * A static-table lookup, not a catalog scan: OIDs of built-in types are
  * wire-protocol constants (public pg knowledge, pg_type.dat), so a scalar
  * expression suffices and stays free of catalog state.
  */
object FormatTypeExpression {

  /** The reference's supported type OIDs → SQL-standard display names
    * (pg_type.dat constants, restricted to the types the reference's
    * catalog actually carries — an oid it doesn't know formats as `???`,
    * so pg types like point/money/inet are deliberately absent). */
  val typeNames: Map[Int, String] = Map(
    16 -> "boolean", 17 -> "bytea", 18 -> "\"char\"", 19 -> "name",
    20 -> "bigint", 21 -> "smallint", 23 -> "integer", 24 -> "regproc",
    25 -> "text", 26 -> "oid",
    700 -> "real", 701 -> "double precision",
    1042 -> "character", 1043 -> "character varying",
    1082 -> "date", 1083 -> "time", 1114 -> "timestamp without time zone",
    1184 -> "timestamp with time zone", 1186 -> "interval",
    1700 -> "numeric", 2205 -> "regclass", 2206 -> "regtype",
    2249 -> "record", 2276 -> "any", 2277 -> "anyarray",
    2278 -> "void", 2283 -> "anyelement", 2776 -> "anynonarray",
    2950 -> "uuid", 3802 -> "jsonb", 3904 -> "int4range",
    3906 -> "numrange", 3908 -> "tsrange", 3910 -> "tstzrange",
    3912 -> "daterange", 3926 -> "int8range")

  /** Array-type OIDs → element OID (pg_type.dat `typarray` inverted). */
  val arrayElem: Map[Int, Int] = Map(
    1000 -> 16, 1001 -> 17, 1002 -> 18, 1003 -> 19, 1016 -> 20,
    1005 -> 21, 1007 -> 23, 1008 -> 24, 1009 -> 25, 1028 -> 26,
    1021 -> 700, 1022 -> 701,
    1014 -> 1042, 1015 -> 1043, 1182 -> 1082, 1183 -> 1083,
    1115 -> 1114, 1185 -> 1184, 1187 -> 1186,
    1231 -> 1700, 2210 -> 2205, 2211 -> 2206, 2287 -> 2249,
    2951 -> 2950, 3807 -> 3802, 3905 -> 3904, 3907 -> 3906,
    3909 -> 3908, 3911 -> 3910, 3913 -> 3912, 3927 -> 3926)

  /** Render one (oid, typmod) pair; typmod < 0 or null-sentinel = none. */
  def render(oid: Int, typmod: Option[Int]): String = {
    arrayElem.get(oid) match {
      case Some(elem) => render(elem, typmod) + "[]"
      case None =>
        val base = typeNames.getOrElse(oid, "???")
        if (base == "???") return base
        typmod match {
          case Some(m) if m >= 0 =>
            oid match {
              case 1114 => s"timestamp($m) without time zone"
              case 1184 => s"timestamp($m) with time zone"
              case 1083 => s"time($m) without time zone"
              case 1042 | 1043 if m >= 4 => s"$base(${m - 4})"
              case 1700 if m >= 4 =>
                // scale is a SIGNED 16-bit field (pg 15 negative scales)
                val sc = (((m - 4) & 0xffff) << 16) >> 16
                s"numeric(${(m - 4) >> 16},$sc)"
              case 1700 => base // typmod < 4 carries no precision
              // the reference appends a bare (typmod) for other types
              case _ => s"$base($m)"
            }
          case _ => base
        }
    }
  }

  case class FormatType(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "format_type"
    // typmod NULL is meaningful (= no modifier), so null-intolerant
    // BinaryExpression eval doesn't apply — handle nulls by hand
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val o = left.eval(input)
      if (o == null) return null
      val m = right.eval(input)
      UTF8String.fromString(
        render(o.asInstanceOf[Int], Option(m).map(_.asInstanceOf[Int])))
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Type-name spellings → OID, for `'date'::regtype` resolution
    * (pg internal typnames + SQL-standard aliases; reference scalar.rs
    * RegType resolves against the catalog the same way). */
  def typeOids: Map[String, Int] = graft.sql.PgCatalogRelations.oidOfTypname

  /** `'name'::regtype` / `oid::regtype` (reference scalar.rs RegType):
    * numeric text passes through; a type-name spelling resolves to its
    * oid; anything else raises pg's error. Displays as the oid number. */
  case class PgRegtype(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "pg_regtype"
    override protected def nullSafeEval(v: Any): Any = {
      val raw = v.toString.trim
      if (raw.matches("-?\\d+")) raw.toLong.toInt
      else {
        // pg_catalog./public. qualifiers name CATALOG types only — the
        // grammar aliases (int, integer, bigint...) are not catalog rows,
        // so 'pg_catalog.int' is the reference's unknown-type rejection
        val lower = raw.toLowerCase.replace("\"", "")
        val qualified = lower.contains(".")
        val n = lower.stripPrefix("pg_catalog.").stripPrefix("public.")
        val grammarAlias = Set("int", "integer", "bigint", "smallint",
          "boolean", "decimal", "real", "double precision",
          "character varying", "character")
        if (qualified && grammarAlias.contains(n))
          throw new IllegalArgumentException(s"""type "$raw" does not exist""")
        typeOids.get(n).getOrElse(throw new IllegalArgumentException(
          s"""type "$raw" does not exist"""))
      }
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `regtype::text`: the internal type name (mz spelling: int4,
    * timestamptz) for a known oid, the number otherwise (mz renders
    * unknown type oids numerically). */
  case class PgRegtypeOut(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "pg_regtype_out"
    override protected def nullSafeEval(v: Any): Any = {
      val oid = v.asInstanceOf[Int]
      UTF8String.fromString(
        graft.sql.PgCatalogRelations.typnameOfOid.get(oid)
          .getOrElse(oid.toString))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("format_type"),
      new ExpressionInfo(getClass.getName, "format_type"),
      (args: Seq[Expression]) => args match {
        case Seq(o, m) =>
          FormatType(Cast(o, IntegerType), Cast(m, IntegerType))
        case Seq(o) => FormatType(Cast(o, IntegerType), Literal(null, IntegerType))
        case other => throw new IllegalArgumentException(
          s"format_type expects (oid, typmod), got ${other.length} args")
      }),
    (new FunctionIdentifier("pg_regtype"),
      new ExpressionInfo(getClass.getName, "pg_regtype"),
      (args: Seq[Expression]) => PgRegtype(Cast(args.head, StringType))),
    (new FunctionIdentifier("pg_regtype_out"),
      new ExpressionInfo(getClass.getName, "pg_regtype_out"),
      // compose the resolver so both 'date'::regtype::text and
      // 1082::regtype::text reach the renderer as an oid
      (args: Seq[Expression]) => PgRegtypeOut(PgRegtype(Cast(args.head, StringType)))))
}
