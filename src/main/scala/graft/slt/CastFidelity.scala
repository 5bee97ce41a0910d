package graft.slt

/** Emulates the reference's cast-validity matrix for the SLT layer.
  *
  * The reference plans every SQL cast against an explicit (from, to)
  * base-type matrix (`src/sql/src/plan/typeconv.rs` VALID_CASTS,
  * lines 300-1100) and rejects anything absent from it with
  * `CAST does not support casting from <from> to <to>`. Spark's cast
  * lattice is far more permissive (boolean<->int, float->timestamp, ...),
  * so corpus records that expect the reference's plan error would silently
  * succeed here. This scanner detects the *syntactically decidable* subset
  * — chained casts `::t1::t2` (the intermediate type is known exactly),
  * boolean-literal casts `TRUE::t`, and decimal-literal casts `1.2::t`
  * (pg types them numeric) — and reports the reference's error message for
  * the first invalid pair, without needing any schema knowledge.
  *
  * Unknown or custom type names are skipped (no false rejection); identity
  * pairs are always valid.
  */
object CastFidelity {

  /** SQL type spelling -> typeconv.rs base-type tag. Multi-word spellings
    * (double precision, timestamp with time zone, character varying) are
    * normalized by the scanner before lookup. */
  private val base: Map[String, String] = Map(
    "bool" -> "Bool", "boolean" -> "Bool",
    "smallint" -> "Int16", "int2" -> "Int16",
    "int" -> "Int32", "integer" -> "Int32", "int4" -> "Int32",
    "bigint" -> "Int64", "int8" -> "Int64",
    "real" -> "Float32", "float4" -> "Float32",
    "double" -> "Float64", "float8" -> "Float64", "float" -> "Float64",
    "double precision" -> "Float64",
    "numeric" -> "Numeric", "decimal" -> "Numeric", "dec" -> "Numeric",
    "text" -> "String", "string" -> "String",
    "varchar" -> "VarChar", "character varying" -> "VarChar",
    "char" -> "Char", "bpchar" -> "Char", "character" -> "Char",
    "name" -> "PgLegacyName",
    "date" -> "Date", "time" -> "Time",
    "timestamp" -> "Timestamp",
    "timestamptz" -> "TimestampTz",
    "timestamp with time zone" -> "TimestampTz",
    "interval" -> "Interval",
    "jsonb" -> "Jsonb", "json" -> "Jsonb",
    "uuid" -> "Uuid", "bytea" -> "Bytes",
    "oid" -> "Oid", "regclass" -> "RegClass", "regproc" -> "RegProc",
    "regtype" -> "RegType",
    "uint2" -> "UInt16", "uint4" -> "UInt32", "uint8" -> "UInt64",
    "mz_timestamp" -> "MzTimestamp")

  /** Base-type tag -> the reference's rendered name in the error text
    * (`ScalarType::to_string`). */
  private val render: Map[String, String] = Map(
    "Bool" -> "boolean", "Int16" -> "smallint", "Int32" -> "integer",
    "Int64" -> "bigint", "Float32" -> "real",
    "Float64" -> "double precision", "Numeric" -> "numeric",
    "String" -> "text", "VarChar" -> "character varying",
    "Char" -> "character", "PgLegacyChar" -> "\"char\"",
    "PgLegacyName" -> "name",
    "Date" -> "date", "Time" -> "time", "Timestamp" -> "timestamp",
    "TimestampTz" -> "timestamp with time zone", "Interval" -> "interval",
    "Jsonb" -> "jsonb", "Uuid" -> "uuid", "Bytes" -> "bytea",
    "Oid" -> "oid", "RegClass" -> "regclass", "RegProc" -> "regproc",
    "RegType" -> "regtype", "UInt16" -> "uint2", "UInt32" -> "uint4",
    "UInt64" -> "uint8", "MzTimestamp" -> "mz_timestamp",
    "Array" -> "array", "List" -> "list", "Map" -> "map",
    "Range" -> "range", "Record" -> "record")

  /** The full VALID_CASTS pair set, extracted from typeconv.rs verbatim. */
  private val valid: Set[(String, String)] = Set(
    ("AclItem","MzAclItem"), ("AclItem","String"), ("Array","Array"),
    ("Array","List"), ("Array","String"), ("Bool","Int32"),
    ("Bool","Int64"), ("Bool","String"), ("Bytes","String"),
    ("Char","Char"), ("Char","PgLegacyChar"), ("Char","PgLegacyName"),
    ("Char","String"), ("Char","VarChar"), ("Date","MzTimestamp"),
    ("Date","String"), ("Date","Timestamp"), ("Date","TimestampTz"),
    ("Float32","Float64"), ("Float32","Int16"), ("Float32","Int32"),
    ("Float32","Int64"), ("Float32","Numeric"), ("Float32","String"),
    ("Float32","UInt16"), ("Float32","UInt32"), ("Float32","UInt64"),
    ("Float64","Float32"), ("Float64","Int16"), ("Float64","Int32"),
    ("Float64","Int64"), ("Float64","Numeric"), ("Float64","String"),
    ("Float64","UInt16"), ("Float64","UInt32"), ("Float64","UInt64"),
    ("Int16","Float32"), ("Int16","Float64"), ("Int16","Int32"),
    ("Int16","Int64"), ("Int16","Numeric"), ("Int16","Oid"),
    ("Int16","RegClass"), ("Int16","RegProc"), ("Int16","RegType"),
    ("Int16","String"), ("Int16","UInt16"), ("Int16","UInt32"),
    ("Int16","UInt64"), ("Int2Vector","Array"), ("Int2Vector","String"),
    ("Int32","Bool"), ("Int32","Float32"), ("Int32","Float64"),
    ("Int32","Int16"), ("Int32","Int64"), ("Int32","MzTimestamp"),
    ("Int32","Numeric"), ("Int32","Oid"), ("Int32","PgLegacyChar"),
    ("Int32","RegClass"), ("Int32","RegProc"), ("Int32","RegType"),
    ("Int32","String"), ("Int32","UInt16"), ("Int32","UInt32"),
    ("Int32","UInt64"), ("Int64","Bool"), ("Int64","Float32"),
    ("Int64","Float64"), ("Int64","Int16"), ("Int64","Int32"),
    ("Int64","MzTimestamp"), ("Int64","Numeric"), ("Int64","Oid"),
    ("Int64","RegClass"), ("Int64","RegProc"), ("Int64","RegType"),
    ("Int64","String"), ("Int64","UInt16"), ("Int64","UInt32"),
    ("Int64","UInt64"), ("Interval","String"), ("Interval","Time"),
    ("Jsonb","Bool"), ("Jsonb","Float32"), ("Jsonb","Float64"),
    ("Jsonb","Int16"), ("Jsonb","Int32"), ("Jsonb","Int64"),
    ("Jsonb","Numeric"), ("Jsonb","String"), ("List","List"),
    ("List","String"), ("Map","String"), ("MzAclItem","AclItem"),
    ("MzAclItem","String"), ("MzTimestamp","String"),
    ("MzTimestamp","Timestamp"), ("MzTimestamp","TimestampTz"),
    ("Numeric","Float32"), ("Numeric","Float64"), ("Numeric","Int16"),
    ("Numeric","Int32"), ("Numeric","Int64"), ("Numeric","MzTimestamp"),
    ("Numeric","Numeric"), ("Numeric","String"), ("Numeric","UInt16"),
    ("Numeric","UInt32"), ("Numeric","UInt64"), ("Oid","Int32"),
    ("Oid","Int64"), ("Oid","RegClass"), ("Oid","RegProc"),
    ("Oid","RegType"), ("Oid","String"), ("PgLegacyChar","Char"),
    ("PgLegacyChar","Int32"), ("PgLegacyChar","String"),
    ("PgLegacyChar","VarChar"), ("PgLegacyName","Char"),
    ("PgLegacyName","String"), ("PgLegacyName","VarChar"),
    ("Range","String"), ("Record","Record"), ("Record","String"),
    ("RegClass","Oid"), ("RegClass","String"), ("RegProc","Oid"),
    ("RegProc","String"), ("RegType","Oid"), ("RegType","String"),
    ("String","Array"), ("String","Bool"), ("String","Bytes"),
    ("String","Char"), ("String","Date"), ("String","Float32"),
    ("String","Float64"), ("String","Int16"), ("String","Int2Vector"),
    ("String","Int32"), ("String","Int64"), ("String","Interval"),
    ("String","Jsonb"), ("String","List"), ("String","Map"),
    ("String","MzTimestamp"), ("String","Numeric"), ("String","Oid"),
    ("String","PgLegacyChar"), ("String","PgLegacyName"),
    ("String","Range"), ("String","RegClass"), ("String","RegProc"),
    ("String","RegType"), ("String","Time"), ("String","Timestamp"),
    ("String","TimestampTz"), ("String","UInt16"), ("String","UInt32"),
    ("String","UInt64"), ("String","Uuid"), ("String","VarChar"),
    ("Time","Interval"), ("Time","String"), ("Timestamp","Date"),
    ("Timestamp","MzTimestamp"), ("Timestamp","String"),
    ("Timestamp","Time"), ("Timestamp","Timestamp"),
    ("Timestamp","TimestampTz"), ("TimestampTz","Date"),
    ("TimestampTz","MzTimestamp"), ("TimestampTz","String"),
    ("TimestampTz","Time"), ("TimestampTz","Timestamp"),
    ("TimestampTz","TimestampTz"), ("UInt16","Float32"),
    ("UInt16","Float64"), ("UInt16","Int16"), ("UInt16","Int32"),
    ("UInt16","Int64"), ("UInt16","Numeric"), ("UInt16","String"),
    ("UInt16","UInt32"), ("UInt16","UInt64"), ("UInt32","Float32"),
    ("UInt32","Float64"), ("UInt32","Int16"), ("UInt32","Int32"),
    ("UInt32","Int64"), ("UInt32","MzTimestamp"), ("UInt32","Numeric"),
    ("UInt32","String"), ("UInt32","UInt16"), ("UInt32","UInt64"),
    ("UInt64","Float32"), ("UInt64","Float64"), ("UInt64","Int16"),
    ("UInt64","Int32"), ("UInt64","Int64"), ("UInt64","MzTimestamp"),
    ("UInt64","Numeric"), ("UInt64","String"), ("UInt64","UInt16"),
    ("UInt64","UInt32"), ("Uuid","String"), ("VarChar","Char"),
    ("VarChar","PgLegacyChar"), ("VarChar","PgLegacyName"),
    ("VarChar","String"), ("VarChar","VarChar"))

  /** Parses a type name at `start` (after a `::`). Returns the base tag and
    * the index just past the parsed type (including `(n[,m])` args and a
    * `[]` / `list` suffix), or None for unknown/custom names. */
  private def typeAt(sql: String, start: Int): Option[(String, Int)] = {
    var i = start
    val n = sql.length
    def skipWs(): Unit = { while (i < n && sql.charAt(i).isWhitespace) i += 1 }
    skipWs()
    if (i < n && sql.charAt(i) == '"') {
      // only pg's quoted legacy "char" is recognized in quoted form
      val j = sql.indexOf('"', i + 1)
      return if (j > 0 && sql.substring(i + 1, j).equalsIgnoreCase("char"))
        Some(("PgLegacyChar", j + 1)) else None
    }
    val w0 = i
    while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
    if (i == w0) return None
    var nameParts = List(sql.substring(w0, i).toLowerCase)
    // multi-word spellings; each tryWord consumes only on full match
    def tryWord(w: String): Boolean = {
      val save = i; skipWs()
      val s0 = i
      while (i < n && sql.charAt(i).isLetter) i += 1
      if (i > s0 && sql.substring(s0, i).equalsIgnoreCase(w)) true
      else { i = save; false }
    }
    nameParts.head match {
      case "double" => if (tryWord("precision")) nameParts = List("double precision")
      case "character" => if (tryWord("varying")) nameParts = List("character varying")
      case "timestamp" | "time" =>
        val save = i
        if (tryWord("with")) {
          if (tryWord("time") && tryWord("zone"))
            nameParts = List(nameParts.head + " with time zone")
          else i = save
        } else {
          val save2 = i
          if (tryWord("without")) {
            if (!(tryWord("time") && tryWord("zone"))) i = save2
            // "without time zone" = the plain spelling
          }
        }
      case _ => ()
    }
    val name = nameParts.head
    // optional (n[,m]) argument list
    run {
      val save = i; skipWs()
      if (i < n && sql.charAt(i) == '(') {
        val close = sql.indexOf(')', i)
        if (close > 0 && sql.substring(i + 1, close).matches("[\\d\\s,]*")) i = close + 1
        else i = save
      } else i = save
    }
    // suffix: [] -> Array, `list` -> List (mz list types)
    val save3 = i
    skipWs()
    if (i + 1 < n && sql.charAt(i) == '[' && sql.charAt(i + 1) == ']') {
      if (!base.contains(name)) return None
      return Some(("Array", i + 2))
    }
    i = save3
    if (tryWord("list")) {
      if (!base.contains(name)) return None
      return Some(("List", i))
    }
    i = save3
    base.get(name).map(b => (b, i))
  }

  private def run(f: => Unit): Unit = f

  /** pg's string category (reference src/sql/src/func.rs TypeCategory
    * ::from_type): plan_cast (typeconv.rs:1552-1566) replaces a
    * string-category operand with plain String before consulting the
    * matrix, so e.g. char -> smallint plans as text -> smallint. */
  private val stringCat =
    Set("String", "Char", "VarChar", "PgLegacyChar", "PgLegacyName")

  /** The pair check the reference's plan_cast performs, including the
    * string-category substitution. Returns the (from, to) the error would
    * render when invalid. */
  private def checkPair(from: String, to: String): Option[(String, String)] = {
    if (from == to) return None
    val fS = stringCat(from); val tS = stringCat(to)
    if (fS && tS) None // char/varchar/text/name interconvert freely
    else if (fS) { if (valid(("String", to))) None else Some(("String", to)) }
    else if (tS) { if (valid((from, "String"))) None else Some((from, "String")) }
    else if (valid((from, to))) None
    else Some((from, to))
  }

  /** Scans `sql` (outside string literals) for invalid cast pairs; returns
    * the reference's error message for the first hit. */
  def invalidCast(sql: String): Option[String] = {
    if (!sql.contains("::")) return None
    val n = sql.length
    var i = 0
    var inQ = false
    def err(from: String, to: String): Option[String] =
      checkPair(from, to).map { case (f, t) =>
        s"CAST does not support casting from ${render(f)} to ${render(t)}"
      }
    def isWordCh(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (inQ) { if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { inQ = true; i += 1 }
      else if (c == ':' && i + 1 < n && sql.charAt(i + 1) == ':') {
        // a `::` — parse the type; if another `::` follows it, check the pair
        typeAt(sql, i + 2) match {
          case Some((from, end)) =>
            var j = end
            while (j < n && sql.charAt(j).isWhitespace) j += 1
            if (j + 1 < n && sql.charAt(j) == ':' && sql.charAt(j + 1) == ':') {
              typeAt(sql, j + 2) match {
                case Some((to, _)) =>
                  val e = err(from, to)
                  if (e.isDefined) return e
                case _ => ()
              }
            }
            i = end
          case None => i += 2
        }
      }
      else if ((c == 't' || c == 'T' || c == 'f' || c == 'F') &&
          (i == 0 || !isWordCh(sql.charAt(i - 1)))) {
        // TRUE::t / FALSE::t — a boolean literal cast
        val isTrue = sql.regionMatches(true, i, "true", 0, 4)
        val isFalse = !isTrue && sql.regionMatches(true, i, "false", 0, 5)
        val wl = if (isTrue) 4 else if (isFalse) 5 else 0
        if (wl > 0 && (i + wl >= n || !isWordCh(sql.charAt(i + wl)))) {
          var j = i + wl
          while (j < n && sql.charAt(j).isWhitespace) j += 1
          if (j + 1 < n && sql.charAt(j) == ':' && sql.charAt(j + 1) == ':') {
            typeAt(sql, j + 2) match {
              case Some((to, _)) =>
                val e = err("Bool", to)
                if (e.isDefined) return e
              case _ => ()
            }
          }
          i += wl
        } else i += 1
      }
      else if (c.isDigit && (i == 0 ||
          (!isWordCh(sql.charAt(i - 1)) && sql.charAt(i - 1) != '.'))) {
        // decimal literal (pg types `1.2` numeric): 1.2::t
        var j = i
        while (j < n && sql.charAt(j).isDigit) j += 1
        if (j < n && sql.charAt(j) == '.' && j + 1 < n && sql.charAt(j + 1).isDigit) {
          j += 1
          while (j < n && sql.charAt(j).isDigit) j += 1
          val end = j
          while (j < n && sql.charAt(j).isWhitespace) j += 1
          if (j + 1 < n && sql.charAt(j) == ':' && sql.charAt(j + 1) == ':') {
            typeAt(sql, j + 2) match {
              case Some((to, _)) =>
                val e = err("Numeric", to)
                if (e.isDefined) return e
              case _ => ()
            }
          }
          i = end
        } else i = j
      }
      else i += 1
    }
    None
  }
}
