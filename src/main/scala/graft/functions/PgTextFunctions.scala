package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DecimalType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg text/formatting functions the reference exposes (both are ordinary
  * function-registry builders, so the analyzer type-coerces the trees):
  *
  *  - `quote_ident(s)` — pg quoting rules as the reference implements them
  *    (`src/sql-parser/src/ast/defs/name.rs` `can_be_printed_bare`): bare iff
  *    the string matches `[a-z_][a-z0-9_]*` AND is not a keyword the
  *    reference's parser would mis-reparse (always/sometimes-reserved,
  *    query-body starters, and the special-cased AS/ANY/ALL/SOME/DISTINCT/
  *    LIST/PREPARE/WHEN/INTO/IF — `src/sql-lexer/src/keywords.rs:64-155`);
  *    otherwise wrapped in double quotes with embedded quotes doubled.
  *  - `pg_size_pretty(n)` — bytes/kB/MB/GB/TB/PB with half-up rounding at
  *    each 10240-per-unit threshold (pg dbsize.c). Computed in
  *    DECIMAL(38,1): the corpus distinguishes `10239 PB` from `10240 PB` at
  *    magnitudes where double arithmetic collapses the boundary.
  */
object PgTextFunctions {

  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  /** Keywords the reference quotes even when all-lowercase-bare. */
  private val quotedKeywords: Seq[String] = Seq(
    // is_always_reserved
    "with", "select", "from", "where", "group", "having", "qualify",
    "window", "order", "limit", "offset", "fetch", "options", "returning",
    "union", "except", "intersect",
    // is_reserved_in_scalar_expression
    "true", "false", "null", "array", "case", "cast", "not",
    // is_reserved_in_table_alias
    "on", "join", "inner", "cross", "full", "left", "right", "natural",
    "using", "set", "outer",
    // is_reserved_in_column_alias
    "year", "month", "day", "hour", "minute", "second",
    // begins_query_body
    "values", "show", "table",
    // AstDisplay round-trip hazards special-cased in can_be_printed_bare
    "as", "any", "all", "some", "distinct", "list", "prepare", "when",
    "into", "if")

  private def quoteIdent(args: Seq[Expression]): Expression = args match {
    case Seq(s) =>
      val bare = And(
        RLike(s, Literal("^[a-z_][a-z0-9_]*$")),
        Not(In(s, quotedKeywords.map(Literal(_)))))
      val quoted = Concat(Seq(
        Literal("\""),
        StringReplace(s, Literal("\""), Literal("\"\"")),
        Literal("\"")))
      If(bare, s, quoted)
    case other => throw new IllegalArgumentException(
      s"quote_ident expects one argument, got ${other.length}")
  }

  private def pgSizePretty(args: Seq[Expression]): Expression = args match {
    case Seq(x) =>
      // pg dbsize.c shifts PROGRESSIVELY, flooring at every level
      // (`size >>= 9` then `>>= 10` per unit), and only the final halving
      // rounds (`half_rounded`). Direct division disagrees at the unit
      // boundaries — `10240*2^50 - 1` is 10239 PB in pg, not 10240.
      val a = Abs(Cast(x, DecimalType(38, 1)), failOnError = false)
      val sign = If(LessThan(x, Literal(0)), Literal("-"), Literal(""))
      // pg renders numerics minimally ("10", "10.5") — strip the trailing
      // zeros/point a DECIMAL(38,18) cast would otherwise print
      def minimal(e: Expression): Expression =
        RegExpReplace(
          RegExpReplace(e, Literal("(\\.\\d*?)0+$"), Literal("$1")),
          Literal("\\.$"), Literal(""))
      def floorDiv(e: Expression, d: Long): Expression =
        Floor(Divide(e, Literal(d)))
      val v1 = floorDiv(a, 512L)
      val v2 = floorDiv(v1, 1024L)
      val v3 = floorDiv(v2, 1024L)
      val v4 = floorDiv(v3, 1024L)
      val v5 = floorDiv(v4, 1024L)
      val limit = Literal(20479) // 10*1024*2 - 1
      def unit(v: Expression, label: String): Expression =
        Concat(Seq(sign,
          Cast(Cast(floorDiv(Add(v, Literal(1)), 2L), LongType), StringType),
          Literal(" " + label)))
      CaseWhen(
        Seq(
          (LessThan(a, Literal(10240)),
            Concat(Seq(minimal(Cast(x, StringType)), Literal(" bytes")))),
          (LessThan(v1, limit), unit(v1, "kB")),
          (LessThan(v2, limit), unit(v2, "MB")),
          (LessThan(v3, limit), unit(v3, "GB")),
          (LessThan(v4, limit), unit(v4, "TB"))),
        Some(unit(v5, "PB")))
    case other => throw new IllegalArgumentException(
      s"pg_size_pretty expects one argument, got ${other.length}")
  }

  /** UTF-8-safe truncation to pg's NAMEDATALEN-1 = 63 bytes: never splits a
    * multi-byte character (a codepoint straddling the limit is dropped). */
  def truncName(u: UTF8String): UTF8String = {
    val b = u.getBytes
    if (b.length <= 63) u
    else {
      var end = 63
      while (end > 0 && (b(end) & 0xC0) == 0x80) end -= 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 0, end))
    }
  }

  /** pg `oid` is a wrapping uint32; rendered as STRING so downstream
    * surfaces (to_jsonb quotes oids, text comparisons) match the
    * reference. `'-1'::oid` → "4294967295". */
  private def pgOid(args: Seq[Expression]): Expression = PgOidIn(args.head)

  /** `::oid` checked input (reference oid.rs / strconv parse_oid): text
    * must spell an integer in [-2147483648, 4294967295]; negatives wrap to
    * the uint32 domain; out-of-range raises pg's input-syntax error. */
  case class PgOidIn(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "pg_oid"
    override protected def nullSafeEval(v: Any): Any = {
      val isText = child.dataType == StringType
      val s = v.toString.trim
      // text input must SPELL an integer (reference strconv parse_oid
      // rejects '1.5'); rounding applies to numeric-typed children only
      if (isText && !s.matches("[+-]?\\d+"))
        throw new IllegalArgumentException(
          s"""invalid input syntax for type oid: "$s"""")
      val n =
        try BigDecimal(s).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
        catch { case _: Exception => throw new IllegalArgumentException(
          s"""invalid input syntax for type oid: "$s"""") }
      if (n < BigInt(Int.MinValue) || n > BigInt(4294967295L)) {
        if (isText) throw new IllegalArgumentException(
          s"""invalid input syntax for type oid: "$s"""")
        else throw new ArithmeticException("OID out of range")
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(
        ((n.toLong + 4294967296L) % 4294967296L).toString)
    }
    override protected def withNewChildInternal(c: Expression): PgOidIn =
      copy(child = c)
  }

  /** `'name'::regclass` (reference src/repr/src/scalar.rs RegClass): a
    * relation name resolved to its oid. Numeric input passes through (pg
    * trusts the number); names resolve against the same oid assignment the
    * emulated catalog uses — the ambient pg_catalog relations and user
    * tables hash through userOid (matching pg_class/pg_attribute rows),
    * builtin mz relations take their published oid from the census
    * (matching mz_objects). */
  case class PgRegclass(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "pg_regclass"
    private val ambient =
      Set("pg_type", "pg_class", "pg_attribute", "pg_namespace", "pg_index")
    override protected def nullSafeEval(v: Any): Any = {
      val raw = v.toString.trim
      // numeric input is an oid: pg's uint32, wrapping negatives
      if (raw.matches("-?\\d+"))
        java.lang.Long.parseLong(raw) & 0xFFFFFFFFL
      else {
        val parts = raw.replace("\"", "").split("\\.")
        val name = parts.last.toLowerCase
        val schema = if (parts.length > 1) parts(parts.length - 2).toLowerCase else ""
        // a schema qualification must name a known schema (the reference
        // resolves the path first: 'foo.pg_constraint' -> unknown schema)
        if (schema.nonEmpty && !Set("pg_catalog", "mz_catalog", "mz_internal",
            "mz_introspection", "mz_unsafe", "information_schema", "public",
            "materialize").contains(schema))
          throw new IllegalArgumentException(s"unknown schema '$schema'")
        val oid =
          if (ambient.contains(name)) graft.sql.PgCatalogRelations.userOid(name)
          else {
            val census =
              if (schema.nonEmpty)
                graft.sql.MzCatalogCensus.objectOids.get((schema, name))
              else graft.sql.MzCatalogCensus.objectOids.collectFirst {
                case ((_, n), oid) if n == name && oid != 0 => oid
              }
            census.filter(_ != 0)
              .getOrElse(graft.sql.PgCatalogRelations.userOid(name))
          }
        oid.toLong
      }
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `'...'::uuid` (reference src/repr/src/adt/uuid.rs / strconv): accepts
    * hyphenated, bare-hex, braced, and urn:uuid: forms in any case; renders
    * the canonical lowercase 8-4-4-4-12 text. Invalid input errors with
    * pg's message. The engine stores uuid as its canonical text. */
  case class PgUuidCast(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "pg_uuid"
    override protected def nullSafeEval(v: Any): Any = {
      val raw = v.toString.trim
      var s = raw.toLowerCase
      if (s.startsWith("urn:uuid:")) s = s.substring(9)
      if (s.startsWith("{") && s.endsWith("}")) s = s.substring(1, s.length - 1)
      // hyphenated form requires the STRICT 8-4-4-4-12 grouping (the
      // reference validates via the uuid crate: 'invalid group length in
      // group N'); the bare form is 32 hex digits
      if (s.contains('-')) {
        val groups = s.split("-", -1)
        val want = Seq(8, 4, 4, 4, 12)
        if (groups.length != 5)
          throw new ArithmeticException(
            s"""invalid input syntax for type uuid: "$raw"""")
        groups.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          if (g.length != w)
            throw new ArithmeticException(
              s"invalid input syntax for type uuid: invalid group length " +
                s"in group ${i + 1}: expected $w, found ${g.length}")
        }
      }
      val hex = s.replace("-", "")
      if (hex.length != 32 || !hex.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))
        throw new ArithmeticException(
          s"""invalid input syntax for type uuid: "$raw"""")
      UTF8String.fromString(
        s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20)}")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `uuid_generate_v5(namespace_uuid, name)` — RFC 4122 §4.3 name-based
    * UUID as a pure built-in expression tree (same construction as
    * [[graft.functions.PgFunctions.uuidV5]], here over raw Catalyst
    * expressions so the SQL surface resolves it; reference
    * `src/expr/src/scalar/func/binary.rs` UuidGenerateV5). */
  private def uuidGenerateV5(args: Seq[Expression]): Expression = {
    val ns = StringReplace(Cast(args(0), StringType), Literal("-"), Literal(""))
    val nm = Cast(args(1), StringType)
    val h = Sha1(Concat(Seq(Unhex(ns), Encode(nm, Literal("UTF-8")))))
    def sub(p: Int, l: Int) = Substring(h, Literal(p), Literal(l))
    val variantDigit = Lower(Conv(
      Cast(
        Add(
          Remainder(Cast(Conv(sub(17, 1), Literal(16), Literal(10)), IntegerType),
            Literal(4)),
          Literal(8)),
        StringType),
      Literal(10), Literal(16)))
    val uuid = ConcatWs(Seq(Literal("-"),
      sub(1, 8), sub(9, 4),
      Concat(Seq(Literal("5"), sub(14, 3))),
      Concat(Seq(variantDigit, sub(18, 3))),
      sub(21, 12)))
    // ConcatWs skips NULL pieces — a NULL operand must yield NULL, not ""
    If(Or(IsNull(args(0)), IsNull(args(1))),
      Literal.create(null, StringType), uuid)
  }

  /** (identifier, info, builder) triples for SparkSessionExtensions. */
  /** pg_get_viewdef(name|oid[, pretty]) (pg system catalog info; reference
    * mz pg_get_viewdef over create_sql): NULL for an unknown relation or
    * oid 0 — exact; a KNOWN view's mz-catalog rendering ([uN AS ...] id
    * forms) is not emulated, so those raise (an honest dialect skip). */
  case class PgGetViewdef(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "pg_get_viewdef"
    override protected def nullSafeEval(v: Any): Any = {
      val s = v.toString.trim
      if (s.isEmpty || s == "0") return null
      if (s.matches("\\d+"))
        throw new IllegalArgumentException(
          "UNSUPPORTED: pg_get_viewdef catalog rendering not emulated")
      val known = scala.util.Try(
        org.apache.spark.sql.SparkSession.active.catalog.tableExists(s))
        .getOrElse(false)
      if (!known) null
      else throw new IllegalArgumentException(
        "UNSUPPORTED: pg_get_viewdef catalog rendering not emulated")
    }
    override protected def withNewChildInternal(c: Expression): PgGetViewdef =
      copy(child = c)
  }

  /** pg_column_size(x): mz's internal row-encoding byte size — NULL input
    * yields NULL (exact); non-null sizes depend on the reference's datum
    * packing, which is not emulated (honest dialect skip). */
  case class PgColumnSize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "pg_column_size"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null
      else throw new IllegalArgumentException(
        "UNSUPPORTED: pg_column_size datum packing not emulated")
    }
    override protected def withNewChildInternal(c: Expression): PgColumnSize =
      copy(child = c)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("pg_get_viewdef"), info("pg_get_viewdef"),
        (args: Seq[Expression]) => PgGetViewdef(args.head)),
      (FunctionIdentifier("pg_column_size"), info("pg_column_size"),
        (args: Seq[Expression]) => PgColumnSize(args.head)),
      // pg regexp_split_to_table(string, pattern[, flags]) — a set-returning
      // split (reference src/expr/src/relation/func.rs RegexpSplitToTable);
      // composed from Spark's codegen'd split + the Explode generator, so a
      // big document column fans out inside whole-stage codegen
      (FunctionIdentifier("regexp_split_to_table"), info("regexp_split_to_table"),
        (args: Seq[Expression]) => Explode(PgRegexpSplit(args))),
      // pg strpos(string, substring) — 1-based, 0 when absent (reference
      // src/expr/src/scalar/func.rs Position); Spark's codegen'd instr
      (FunctionIdentifier("strpos"), info("strpos"),
        (args: Seq[Expression]) => StringInstr(args(0), args(1))),
      // pg array_to_string(arr, sep[, null_string]) = Spark array_join
      (FunctionIdentifier("array_to_string"), info("array_to_string"),
        (args: Seq[Expression]) =>
          ArrayJoin(args(0), args(1),
            args.lift(2).filter(e => !e.foldable || e.eval(null) != null)),
      ),
      // pg regexp_split_to_array(string, pattern[, flags])
      (FunctionIdentifier("regexp_split_to_array"), info("regexp_split_to_array"),
        (args: Seq[Expression]) => PgRegexpSplit(args)),
      // crdb sha384(x) -> bytea digest (reference follows pgcrypto's
      // bytes-out convention for the standalone shaNNN functions)
      (FunctionIdentifier("sha384"), info("sha384"),
        (args: Seq[Expression]) =>
          PgCryptoFunctions.PgDigest(Seq(args.head, Literal("sha384")))),
      // pg get_bit(bytea, offset): LSB-first within each byte
      (FunctionIdentifier("get_bit"), info("get_bit"),
        (args: Seq[Expression]) => GetBit(args(0), args(1))),
      // participation-aware capture-group extract (mz regexp_extract
      // table function: '' = empty match, NULL = group didn't participate)
      (FunctionIdentifier("pg_regexp_group"), info("pg_regexp_group"),
        (args: Seq[Expression]) => PgRegexpGroup(args(0), args(1), args(2))),
      // pg normalize(text[, form]) — form pre-validated by the shim
      (FunctionIdentifier("pg_normalize"), info("pg_normalize"),
        (args: Seq[Expression]) => PgNormalize(args(0),
          args.lift(1).getOrElse(Literal("NFC")))),
      // pg string_to_array(text, delim[, null_string])
      (FunctionIdentifier("string_to_array"), info("string_to_array"),
        (args: Seq[Expression]) => StringToArray(args(0), args(1),
          args.lift(2).getOrElse(Literal(null,
            org.apache.spark.sql.types.StringType)))),
      // mz timezone_offset(tz, timestamptz) -> (abbrev, base, dst) record
      (FunctionIdentifier("timezone_offset"), info("timezone_offset"),
        (args: Seq[Expression]) => TimezoneOffset(args(0), args(1))),
      // pg int2vector text input (checked)
      (FunctionIdentifier("pg_int2vector"), info("pg_int2vector"),
        (args: Seq[Expression]) => PgInt2Vector(args.head)),
      // pg 14 date_bin(stride, source, origin)
      (FunctionIdentifier("date_bin"), info("date_bin"),
        (args: Seq[Expression]) => DateBinExpr(
          if (args.length == 3) args
          else args :+ Literal(0L, org.apache.spark.sql.types.TimestampType))),
      // pg date_trunc over the full field list (checked unknown units)
      (FunctionIdentifier("pg_date_trunc"), info("pg_date_trunc"),
        (args: Seq[Expression]) => PgDateTrunc(args)),
      (FunctionIdentifier("mz_normalize_object_name"),
        info("mz_normalize_object_name"),
        (a: Seq[Expression]) => MzNormalizeName(a.head, 3)),
      (FunctionIdentifier("mz_normalize_schema_name"),
        info("mz_normalize_schema_name"),
        (a: Seq[Expression]) => MzNormalizeName(a.head, 2)),
      // pg parse_ident(text[, strict]) -> text[]
      (FunctionIdentifier("parse_ident"), info("parse_ident"),
        (args: Seq[Expression]) => ParseIdent(args.head,
          args.lift(1).getOrElse(Literal(true)))),
      (FunctionIdentifier("quote_ident"), info("quote_ident"), quoteIdent _),
      (FunctionIdentifier("pg_size_pretty"), info("pg_size_pretty"), pgSizePretty _),
      (FunctionIdentifier("pg_oid"), info("pg_oid"), pgOid _),
      (FunctionIdentifier("pg_regclass"), info("pg_regclass"),
        (args: Seq[Expression]) => PgRegclass(Cast(args.head, StringType))),
      (FunctionIdentifier("pg_uuid"), info("pg_uuid"),
        (args: Seq[Expression]) => PgUuidCast(Cast(args.head, StringType))),
      (FunctionIdentifier("uuid_generate_v5"), info("uuid_generate_v5"),
        uuidGenerateV5 _),
      (FunctionIdentifier("pg_time"), info("pg_time"),
        (args: Seq[Expression]) => PgTimeCast(Cast(args.head, StringType))),
      (FunctionIdentifier("pg_name"), info("pg_name"),
        (args: Seq[Expression]) => PgNameCast(Cast(args.head, StringType))),
      (FunctionIdentifier("pg_typeof"), info("pg_typeof"),
        (args: Seq[Expression]) => PgTypeof(args.head)),
      // the reference's fast-path ISO8601 parser (src/repr/src/adt/
      // timestamp.rs try_parse_monotonic_iso8601): EXACTLY
      // YYYY-MM-DDTHH:MM:SS.mmmZ, anything else NULL — monotonic-cast
      // pushdown relies on the format never widening
      (FunctionIdentifier("try_parse_monotonic_iso8601_timestamp"),
        info("try_parse_monotonic_iso8601_timestamp"),
        (args: Seq[Expression]) => {
          val s = args.head
          If(RLike(s, Literal("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{3}Z$")),
            Cast(s, org.apache.spark.sql.types.TimestampType, None, EvalMode.TRY),
            Literal(null, org.apache.spark.sql.types.TimestampType))
        }))
}

/** `pg_typeof(e)` — the pg spelling of the expression's RESOLVED type
  * (reference `src/sql/src/func.rs` pg_typeof; pg's typeof.c). The answer
  * depends only on the type, never the value, so the node is foldable and
  * ConstantFolding replaces it with a string literal without evaluating
  * the child. */
case class PgTypeof(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(
      if (PgTypeof.isListExpr(child)) PgTypeof.listName(child.dataType)
      else PgTypeof.pgName(child.dataType))
  override protected def withNewChildInternal(newChild: Expression): PgTypeof =
    copy(child = newChild)
}

object PgTypeof {
  import org.apache.spark.sql.types._
  def pgName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case _: DecimalType => "numeric"
    case StringType => "text"
    case BinaryType => "bytea"
    case DateType => "date"
    case TimestampType => "timestamp with time zone"
    case TimestampNTZType => "timestamp"
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
         CalendarIntervalType => "interval"
    case ArrayType(e, _) => pgName(e) + "[]"
    case MapType(k, v, _) => s"map[${pgName(k)}=>${pgName(v)}]"
    case _: StructType => "record"
    case other => other.simpleString
  }

  /** A LIST-producing expression (the engine backs mz lists with Spark
    * arrays; these markers are the only type-identity difference). */
  def isListExpr(e: Expression): Boolean = e match {
    case _: MzListExpressions.MzListIn | _: MzListExpressions.MzListTag |
         _: MzListExpressions.MzListAppend | _: MzListExpressions.MzListCat |
         _: MzListExpressions.MzListCast | _: MzListExpressions.MzListSubscript => true
    case _: MzListExpressions.MzListRemove | _: MzListExpressions.MzListSlice => true
    case r: MzListExpressions.MzListRoundCast => isListExpr(r.child)
    // a cast of a list stays a list
    case c: Cast => isListExpr(c.child)
    case _ => false
  }

  /** pg name with every array dimension spelled as ` list`. */
  def listName(dt: DataType): String = dt match {
    case ArrayType(e, _) => listName(e) + " list"
    case t => pgName(t)
  }
}

/** pg `time` for the SLT shim: normalized "HH:MM:SS[.fff]" text, so string
  * comparison and sorting match time order ("1:2:3.7890" → "01:02:03.789").
  * CodegenFallback: dialect-compat surface only. */
case class PgTimeCast(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any): Any = {
    // timestamp input (epoch micros): project the time-of-day component
    s match {
      case us: java.lang.Long
          if child.dataType == org.apache.spark.sql.types.TimestampType =>
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        return UTF8String.fromString(
          ldt.toLocalTime.format(java.time.format.DateTimeFormatter
            .ofPattern("HH:mm:ss" + (if (ldt.getNano != 0) ".SSSSSS" else "")))
            .replaceAll("(\\.\\d*?)0+$", "$1").stripSuffix("."))
      case _ => ()
    }
    val m = """^\s*(\d{1,2}):(\d{1,2})(?::(\d{1,2})(\.\d+)?)?\s*$""".r
    s.toString match {
      case m(h, mi, sec, frac) =>
        val base = f"${h.toInt}%02d:${mi.toInt}%02d:${Option(sec).map(_.toInt).getOrElse(0)}%02d"
        val f2 = Option(frac).map(_.replaceAll("0+$", "")).filter(_ != ".").getOrElse("")
        UTF8String.fromString(base + f2)
      case other =>
        throw new IllegalArgumentException(s"UNSUPPORTED time literal: $other")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): PgTimeCast =
    copy(child = newChild)
}

/** pg `name` type semantics for the SLT shim's `::name` rewrite: a string
  * truncated to 63 BYTES at a character boundary (pg truncate_identifier;
  * the reference's `name` is pg-compatible). CodegenFallback: this exists
  * for the dialect-compat surface, never a hot data path. */
case class PgNameCast(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any): Any =
    PgTextFunctions.truncName(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): PgNameCast =
    copy(child = newChild)
}

/** pg `get_bit(bytea, offset)` — bit `offset` with LSB-first numbering
  * within each byte (pg functions-binarystring; reference
  * `src/expr/src/scalar/func.rs` get_bit). Out-of-range offsets raise pg's
  * index error text. */
/** pg `string_to_array(text, delim [, null_string])` (postgres
  * varlena.c text_to_array, reference func.rs StringToArray): NULL
  * delimiter splits into single characters, empty delimiter yields the
  * whole string as one element, empty input yields the empty array,
  * consecutive delimiters produce empty fields, and fields equal to
  * null_string become NULL. Plain substring split — NOT regex. */
case class StringToArray(str: Expression, delim: Expression,
    nullStr: Expression) extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  override def children: Seq[Expression] = Seq(str, delim, nullStr)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "string_to_array"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{NullType, StringType => ST}
    if (children.forall(c => c.dataType == ST || c.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "function string_to_array requires text arguments") // mz: no such overload
  }
  override def eval(input: InternalRow): Any = {
    val sv = str.eval(input)
    if (sv == null) return null
    val s = sv.toString
    val dv = delim.eval(input)
    val nv = nullStr.eval(input)
    val fields: Seq[String] =
      if (s.isEmpty) Seq.empty
      else if (dv == null) s.map(_.toString)
      else {
        val d = dv.toString
        if (d.isEmpty) Seq(s)
        else {
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          var at = s.indexOf(d, i)
          while (at >= 0) {
            out += s.substring(i, at)
            i = at + d.length
            at = s.indexOf(d, i)
          }
          out += s.substring(i)
          out.toSeq
        }
      }
    val ns = if (nv == null) null else nv.toString
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      fields.map(f =>
        if (ns != null && f == ns) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(f)).toArray)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StringToArray =
    copy(str = c(0), delim = c(1), nullStr = c(2))
}

/** mz `timezone_offset(tz, timestamptz)` (reference func.rs
  * TimezoneOffset): record (abbrev, base_utc_offset, dst_offset) for the
  * IANA zone at the given instant. Offsets render in pg interval HH:MM:SS
  * text; the zone name resolves case-insensitively. */
case class TimezoneOffset(tz: Expression, ts: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = tz
  override def right: Expression = ts
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("abbrev",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("base_utc_offset",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("dst_offset",
      org.apache.spark.sql.types.StringType)))
  override def prettyName: String = "timezone_offset"
  private def fmtOffset(secs: Int): String = {
    val a = math.abs(secs)
    f"${if (secs < 0) "-" else ""}${a / 3600}%02d:${a / 60 % 60}%02d:${a % 60}%02d"
  }
  override protected def nullSafeEval(tzv: Any, tsv: Any): Any = {
    import scala.jdk.CollectionConverters._
    val name = tzv.toString
    val zid = java.time.ZoneId.getAvailableZoneIds.asScala
      .find(_.equalsIgnoreCase(name))
      .map(java.time.ZoneId.of)
      .getOrElse(throw new IllegalArgumentException(
        s"invalid IANA Time Zone Database identifier: '$name'"))
    val micros = tsv match {
      case l: java.lang.Long => l.longValue
      case other => PgTimestampPrecision.parseRound(other.toString, 6,
        convertZone = true)
    }
    val instant = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val rules = zid.getRules
    val std = rules.getStandardOffset(instant).getTotalSeconds
    val total = rules.getOffset(instant).getTotalSeconds
    // tzdb (the reference's chrono-tz) keeps ALPHABETIC abbreviations only
    // for a closed set of zones; everywhere else the abbreviation is the
    // numeric total offset (+05, +05:30). Java's CLDR short names invent
    // legacy codes (ALMT, CHOST) tzdb dropped — accept only the tzdb set.
    val cldr = java.time.format.DateTimeFormatter.ofPattern("zzz")
      .withZone(zid).format(instant)
    val abbrev =
      if (TimezoneOffset.tzdbAlphabetic.contains(cldr)) cldr
      else {
        val a = math.abs(total)
        val sign = if (total < 0) "-" else "+"
        f"$sign${a / 3600}%02d" +
          (if (a % 3600 != 0) f":${a / 60 % 60}%02d" else "")
      }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(abbrev),
      org.apache.spark.unsafe.types.UTF8String.fromString(fmtOffset(std)),
      org.apache.spark.unsafe.types.UTF8String.fromString(fmtOffset(total - std)))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TimezoneOffset =
    copy(tz = newLeft, ts = newRight)
}

object TimezoneOffset {
  /** The alphabetic abbreviations modern tzdb (2017a+) still emits — all
    * other zones use numeric %z forms (tzdata NEWS, releases 2016f-2017a
    * "use numeric time zone abbreviations for..."). */
  val tzdbAlphabetic: Set[String] = Set(
    "GMT", "UTC", "UT",
    // North America
    "EST", "EDT", "CST", "CDT", "MST", "MDT", "PST", "PDT",
    "AST", "ADT", "NST", "NDT", "AKST", "AKDT", "HST", "HDT",
    "CHST", "SST", "EWT", "EPT",
    // Europe
    "WET", "WEST", "CET", "CEST", "EET", "EEST", "BST", "MET", "MEST",
    "MSK", "MSD", "IST", "GMT-1", "BDST",
    // Africa / Middle East
    "WAT", "CAT", "EAT", "SAST", "IDT",
    // Asia / Pacific
    "PKT", "WIB", "WITA", "WIT", "JST", "KST", "KDT", "HKT", "PHT",
    "AEST", "AEDT", "ACST", "ACDT", "AWST", "NZST", "NZDT",
    "CHAST", "CHADT", "LHST", "LHDT")
}

/** pg `int2vector` input (reference src/repr/src/adt/int2vector;
  * pg's oidvector/int2vector family): whitespace-separated int2 tokens,
  * stored canonically as space-joined text. Rejects non-text input
  * (pg has no smallint[] -> int2vector cast) and non-integer tokens. */
case class PgInt2Vector(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "pg_int2vector"
  override protected def nullSafeEval(v: Any): Any = {
    if (child.dataType != org.apache.spark.sql.types.StringType)
      throw new IllegalArgumentException(
        s"CAST does not support casting from ${child.dataType.simpleString} to int2vector")
    val s = v.toString.trim
    val toks = if (s.isEmpty) Array.empty[String] else s.split("\\s+")
    val canon = toks.map { t =>
      try java.lang.Short.parseShort(t).toString
      catch { case _: Exception => throw new IllegalArgumentException(
        s"""invalid input syntax for type int2vector: "$s"""") }
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(canon.mkString(" "))
  }
  override protected def withNewChildInternal(c: Expression): PgInt2Vector =
    copy(child = c)
}

/** pg `normalize(text [, form])` — Unicode normalization via
  * java.text.Normalizer (pg SQL/2023 NORMALIZE; the reference resolves the
  * form keyword at parse time, so `form` here is always one of the four
  * validated spellings injected by the dialect shim). */
case class PgNormalize(text: Expression, form: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = text
  override def right: Expression = form
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "normalize"
  override protected def nullSafeEval(t: Any, f: Any): Any = {
    val fm = java.text.Normalizer.Form.valueOf(f.toString.toUpperCase)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(t.toString, fm))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgNormalize =
    copy(text = newLeft, form = newRight)
}

/** Capture group `idx` of the FIRST match of `pattern` in `subject`,
  * distinguishing PARTICIPATION (reference TableFunc::RegexpExtract,
  * src/expr/src/relation/func.rs): a group that matched the empty string
  * yields '', a non-participating group (optional/alternation branch not
  * taken) yields NULL — java.util.regex.Matcher.group carries exactly
  * that distinction, which Spark's regexp_extract collapses to ''. NULL
  * when the regex doesn't match at all. */
case class PgRegexpGroup(subject: Expression, pattern: Expression,
    idx: Expression) extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  override def children: Seq[Expression] = Seq(subject, pattern, idx)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_regexp_group"
  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      pattern.eval(null).toString) // pattern is a literal at the rewrite site
  override def eval(input: InternalRow): Any = {
    val s = subject.eval(input)
    if (s == null) return null
    val p = if (pattern.foldable) compiled
      else java.util.regex.Pattern.compile(pattern.eval(input).toString)
    val m = p.matcher(s.toString)
    if (!m.find()) return null
    val g = m.group(idx.eval(input).asInstanceOf[Number].intValue)
    if (g == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(g)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PgRegexpGroup =
    copy(subject = c(0), pattern = c(1), idx = c(2))
}

case class GetBit(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "get_bit"
  override protected def nullSafeEval(data: Any, off: Any): Any = {
    val bytes = data match {
      case b: Array[Byte] => b
      case other => graft.functions.PgEncodingImpl.parseBytes(other.toString)
    }
    val i = off.asInstanceOf[Number].longValue
    val valid = bytes.length.toLong * 8
    if (i < 0 || i >= valid)
      throw new IllegalArgumentException(
        s"index $i out of valid range, 0..${valid - 1}")
    (bytes((i / 8).toInt) >> (i % 8).toInt) & 1
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GetBit =
    copy(left = newLeft, right = newRight)
}

/** pg `parse_ident(text[, strict])` — split a qualified identifier into
  * its parts (pg utils/adt/misc.c parse_ident; the corpus transliterates
  * postgres' name.sql): unquoted parts downcase, quoted parts keep case
  * with `""` escapes, whitespace around parts and dots is insignificant,
  * and `strict=false` permits (and ignores) trailing garbage after a
  * complete identifier. Returns text[]. */
case class ParseIdent(text: Expression, strict: Expression)
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  override def children: Seq[Expression] = Seq(text, strict)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "parse_ident"

  override def eval(input: InternalRow): Any = {
    val t0 = text.eval(input)
    val st0 = strict.eval(input)
    if (t0 == null || st0 == null) return null
    val s = t0.toString
    val strictMode = st0 == true
    def fail(): Nothing = throw new IllegalArgumentException(
      s"""string is not a valid identifier: "$s"""")
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    var done = false
    while (!done) {
      ws()
      if (i >= s.length) fail()
      val c = s.charAt(i)
      if (c == '"') {
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= s.length) fail()
          if (s.charAt(i) == '"') {
            if (i + 1 < s.length && s.charAt(i + 1) == '"') { sb += '"'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += s.charAt(i); i += 1 }
        }
        if (sb.isEmpty) fail()
        parts += sb.toString
      } else if (c.isLetter || c == '_' || c >= 0x80) {
        // pg's scanner admits ANY non-ASCII char in identifiers
        val start = i
        while (i < s.length &&
            (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
              s.charAt(i) == '$' || s.charAt(i) >= 0x80))
          i += 1
        parts += s.substring(start, i).toLowerCase
      } else fail()
      ws()
      if (i < s.length && s.charAt(i) == '.') { i += 1 }
      else done = true
    }
    ws()
    if (i < s.length && strictMode) fail()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), strict = newChildren(1))
}

/** mz `mz_normalize_object_name` / `mz_normalize_schema_name`
  * (reference src/expr/src/scalar/func.rs, built on parse_ident): split a
  * qualified name with pg identifier rules, reject too many parts
  * ('improper relation name (too many dotted names): <raw>'), and pad the
  * FRONT with NULLs to the fixed part count (3 for objects, 2 for
  * schemas). Returns a text list. */
case class MzNormalizeName(text: Expression, parts: Int)
    extends UnaryExpression with CodegenFallback {
  override def child: Expression = text
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
  override def nullable: Boolean = true
  @transient private lazy val pi =
    ParseIdent(text, org.apache.spark.sql.catalyst.expressions.Literal(true))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val raw0 = text.eval(input)
    if (raw0 == null) return null
    val v = pi.eval(input)
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (n > parts)
      throw new IllegalArgumentException(
        if (parts == 3)
          s"improper relation name (too many dotted names): ${raw0.toString}"
        else
          s"improper schema name (too many dotted names): ${raw0.toString}")
    val out = new Array[Any](parts)
    var i = 0
    while (i < n) {
      out(parts - n + i) = a.getUTF8String(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(text = newChild)
}

/** pg `date_trunc(field, ts)` over the FULL pg field list (reference
  * `src/expr/src/scalar/func.rs` DateTruncTo / pg timestamp.c): Spark's
  * builtin maps the pg-only fields (microseconds, milliseconds, decade,
  * century, millennium) to NULL and accepts unknown units as NULL — pg
  * truncates resp. raises. Values for the shared fields match Spark's
  * builtin exactly (UTC calendar arithmetic). */
case class PgDateTrunc(children: Seq[Expression])
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  // interval input (mz-canonical text or Spark's ANSI interval types)
  // truncates the INTERVAL (pg date_trunc(field, interval)) and renders
  // interval text back
  override def dataType: DataType = children(1).dataType match {
    case org.apache.spark.sql.types.StringType |
         _: org.apache.spark.sql.types.YearMonthIntervalType |
         _: org.apache.spark.sql.types.DayTimeIntervalType =>
      org.apache.spark.sql.types.StringType
    case _ => org.apache.spark.sql.types.TimestampType
  }
  override def nullable: Boolean = true
  override def prettyName: String = "date_trunc"

  /** pg interval truncation: zero every field finer than `unit`
    * (timestamp/interval.c interval_trunc); week is not defined for
    * intervals. */
  private def truncInterval(unit: String, text: String): String = {
    val iv = MzInterval.parse(text, None) match {
      case scala.util.Right(v) => v
      case scala.util.Left(e) => throw new IllegalArgumentException(e)
    }
    truncIv(unit, iv)
  }

  private def truncIv(unit: String, iv: MzInterval.Iv): String = {
    val out = unit match {
      case "microseconds" => iv
      case "milliseconds" => iv.copy(micros = iv.micros - iv.micros % 1000)
      case "second" => iv.copy(micros = iv.micros - iv.micros % 1000000)
      case "minute" => iv.copy(micros = iv.micros - iv.micros % 60000000L)
      case "hour" => iv.copy(micros = iv.micros - iv.micros % 3600000000L)
      case "day" => iv.copy(micros = 0)
      case "month" => iv.copy(days = 0, micros = 0)
      case "quarter" =>
        iv.copy(months = iv.months - iv.months % 3, days = 0, micros = 0)
      case "year" =>
        iv.copy(months = iv.months - iv.months % 12, days = 0, micros = 0)
      case "decade" =>
        iv.copy(months = iv.months - iv.months % 120, days = 0, micros = 0)
      case "century" =>
        iv.copy(months = iv.months - iv.months % 1200, days = 0, micros = 0)
      case "millennium" =>
        iv.copy(months = iv.months - iv.months % 12000, days = 0, micros = 0)
      case "week" => throw new IllegalArgumentException(
        "unit 'week' not supported for type interval")
      case other => throw new IllegalArgumentException(
        s"""unit '$other' not recognized""")
    }
    MzInterval.render(out)
  }

  private def toMicros(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue * 86400000000L // DateType days
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new IllegalArgumentException(
      s"date_trunc expects a timestamp, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val u0 = children(0).eval(input)
    val ts = children(1).eval(input)
    if (u0 == null || ts == null) return null
    lazy val us = toMicros(ts)
    val unit = u0.toString.trim.toLowerCase.stripSuffix("s") match {
      case "microsecond" => "microseconds"
      case "millisecond" => "milliseconds"
      case "centurie" => "century"
      case o => o
    }
    ts match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        return org.apache.spark.unsafe.types.UTF8String.fromString(
          truncInterval(unit, s.toString))
      case _ => ()
    }
    children(1).dataType match {
      case _: org.apache.spark.sql.types.YearMonthIntervalType =>
        return org.apache.spark.unsafe.types.UTF8String.fromString(
          truncIv(unit, MzInterval.Iv(
            ts.asInstanceOf[Number].longValue, 0, BigInt(0))))
      case _: org.apache.spark.sql.types.DayTimeIntervalType =>
        return org.apache.spark.unsafe.types.UTF8String.fromString(
          truncIv(unit, MzInterval.Iv(0, 0,
            BigInt(ts.asInstanceOf[Number].longValue))))
      case _ => ()
    }
    def floorTo(stepUs: Long): Long = Math.floorDiv(us, stepUs) * stepUs
    def ldt: java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    def fromDate(y: Int, m: Int, d: Int): Long =
      java.time.LocalDateTime.of(y, m, d, 0, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    unit match {
      case "microseconds" => us
      case "milliseconds" => floorTo(1000L)
      case "second" => floorTo(1000000L)
      case "minute" => floorTo(60000000L)
      case "hour" => floorTo(3600000000L)
      case "day" => floorTo(86400000000L)
      case "week" =>
        val d = ldt.toLocalDate
        val monday = d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
        fromDate(monday.getYear, monday.getMonthValue, monday.getDayOfMonth)
      case "month" => fromDate(ldt.getYear, ldt.getMonthValue, 1)
      case "quarter" =>
        fromDate(ldt.getYear, ((ldt.getMonthValue - 1) / 3) * 3 + 1, 1)
      case "year" => fromDate(ldt.getYear, 1, 1)
      case "decade" => fromDate(Math.floorDiv(ldt.getYear, 10) * 10, 1, 1)
      case "century" =>
        fromDate(Math.floorDiv(ldt.getYear - 1, 100) * 100 + 1, 1, 1)
      case "millennium" =>
        fromDate(Math.floorDiv(ldt.getYear - 1, 1000) * 1000 + 1, 1, 1)
      case other => throw new IllegalArgumentException(
        s"""unit '$other' not recognized""")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** pg 14 `date_bin(stride, source, origin)` as a SQL-registered expression
  * (reference `src/expr/src/scalar/func.rs` DateBinTimestamp; pg
  * functions-datetime). Bin start = `source - ((source - origin) mod
  * stride)` with a floor modulus in integer epoch-microseconds — the same
  * arithmetic as [[graft.functions.PgFunctions.dateBinMicros]], here with
  * the stride arriving as an interval value or its pg text form. A stride
  * with a month component raises, as in pg. */
case class DateBinExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  override def dataType: DataType = org.apache.spark.sql.types.TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "date_bin"

  private def widthMicros(v: Any): Long = v match {
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      if (ci.months != 0)
        throw new IllegalArgumentException(
          "timestamps cannot be binned into intervals containing months or years")
      ci.days * 86400000000L + ci.microseconds
    case d: java.time.Duration => d.toNanos / 1000L
    case n: java.lang.Long => n.longValue // DayTimeIntervalType micros
    case other =>
      MzInterval.parse(other.toString, None) match {
        case scala.util.Right(iv) =>
          if (iv.months != 0)
            throw new IllegalArgumentException(
              "timestamps cannot be binned into intervals containing months or years")
          iv.days * 86400000000L + iv.micros.toLong
        case scala.util.Left(err) => throw new IllegalArgumentException(err)
      }
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val w = widthMicros(vs(0))
    if (w <= 0) throw new IllegalArgumentException(
      "stride must be greater than zero")
    def micros(x: Any): Long = x match {
      case l: java.lang.Long => l.longValue
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
      case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case other => throw new IllegalArgumentException(
        s"date_bin expects a timestamp, got $other")
    }
    // the reference computes in i64 NANOseconds (func.rs date_bin):
    // strides and source-origin spans beyond 2^63 ns raise
    if (w > Long.MaxValue / 1000L) throw new IllegalArgumentException(
      "stride cannot exceed 2^63 nanoseconds")
    val t = micros(vs(1))
    val o = micros(vs(2))
    val delta = t - o
    if (delta > Long.MaxValue / 1000L || delta < Long.MinValue / 1000L)
      throw new IllegalArgumentException(
        "source and origin must not differ more than 2^63 nanoseconds")
    val behind = ((delta % w) + w) % w
    t - behind
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
