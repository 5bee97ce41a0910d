package graft.sql

/** The reference's canonical `create_sql` rendering for SHOW CREATE TABLE
  * (reference `src/sql/src/names.rs` raw-name qualification +
  * `src/sql-parser` AST printing): the object name fully qualified as
  * `materialize.<schema>.<name>`, column types spelled as their
  * `pg_catalog.*` catalog names, `WITH (k v)` options in `k = v` form, and
  * a trailing semicolon. Single-line while the statement fits the
  * reference pretty-printer's 100-column width — the corpus' SHOW CREATE
  * TABLE expectations are all in that regime (the versioned multi-line
  * rendering in alter-table.slt stays a classified diff).
  */
object CanonicalSql {

  /** Spark/pg surface type spelling -> the reference's catalog name. */
  private val pgTypeNames: Seq[(String, String)] = Seq(
    "double precision" -> "pg_catalog.float8",
    "timestamp with time zone" -> "pg_catalog.timestamptz",
    "timestamp without time zone" -> "pg_catalog.timestamp",
    "character varying" -> "pg_catalog.varchar",
    "smallint" -> "pg_catalog.int2",
    "int2" -> "pg_catalog.int2",
    "integer" -> "pg_catalog.int4",
    "int4" -> "pg_catalog.int4",
    "int" -> "pg_catalog.int4",
    "bigint" -> "pg_catalog.int8",
    "int8" -> "pg_catalog.int8",
    "boolean" -> "pg_catalog.bool",
    "bool" -> "pg_catalog.bool",
    "real" -> "pg_catalog.float4",
    "float4" -> "pg_catalog.float4",
    "float8" -> "pg_catalog.float8",
    "double" -> "pg_catalog.float8",
    "float" -> "pg_catalog.float8",
    "numeric" -> "pg_catalog.numeric",
    "decimal" -> "pg_catalog.numeric",
    "text" -> "pg_catalog.text",
    "string" -> "pg_catalog.text",
    "varchar" -> "pg_catalog.varchar",
    "bpchar" -> "pg_catalog.bpchar",
    "char" -> "pg_catalog.char",
    "date" -> "pg_catalog.date",
    "timestamptz" -> "pg_catalog.timestamptz",
    "timestamp" -> "pg_catalog.timestamp",
    "time" -> "pg_catalog.time",
    "interval" -> "pg_catalog.interval",
    "jsonb" -> "pg_catalog.jsonb",
    "json" -> "pg_catalog.jsonb",
    "uuid" -> "pg_catalog.uuid",
    "bytea" -> "pg_catalog.bytea",
    "oid" -> "pg_catalog.oid",
    "uint2" -> "mz_catalog.uint2",
    "uint4" -> "mz_catalog.uint4",
    "uint8" -> "mz_catalog.uint8")

  /** `t` -> `materialize.public.t`; `s.t` -> `materialize.s.t`; a
    * already-fully-qualified or quoted-mixed-case name passes through with
    * quoting preserved only where required. */
  def qualify(name: String): String = {
    val parts = name.trim.split("\\.").toSeq.map(stripQuotes)
    val full = parts.length match {
      case 1 => Seq("materialize", "public") ++ parts
      case 2 => Seq("materialize") ++ parts
      case _ => parts
    }
    full.map(renderIdent).mkString(".")
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  /** mz prints identifiers bare when they are safe lowercase idents and
    * double-quoted otherwise. */
  private def renderIdent(id: String): String =
    if (id.matches("[a-z_][a-z0-9_]*")) id else "\"" + id.replace("\"", "\"\"") + "\""

  private def pgType(t: String): String = {
    val trimmed = t.trim
    // split a trailing (mods) off the base spelling
    val m = """(?s)^(.*?)\s*(\(\s*[\d, ]+\))?\s*$""".r.findFirstMatchIn(trimmed).get
    val base = m.group(1).trim.toLowerCase.replaceAll("\\s+", " ")
    val mods = Option(m.group(2)).map(_.replaceAll("\\s", "")).getOrElse("")
    pgTypeNames.collectFirst { case (k, v) if k == base => v + mods }
      .getOrElse(trimmed)
  }

  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    s.foreach { c =>
      if (inQ) { if (c == '\'') inQ = false; cur.append(c) }
      else c match {
        case '\'' => inQ = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val CreateTableRe =
    // the column list is LAZY so a trailing WITH (...) options clause
    // isn't swallowed into it (greedy .* would eat up to the last paren)
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?((?:"[^"]*"|[\w$]+)(?:\s*\.\s*(?:"[^"]*"|[\w$]+)){0,2})\s*\((.*?)\)\s*(WITH\s*\(.*\))?\s*;?\s*$""".r

  /** Canonicalize a recorded CREATE TABLE statement, or None when the text
    * carries constructs outside the canonical single-line regime. */
  /** The SLT session records the SHIMMED statement text — fold its storage
    * markers back to the surface types before rendering. */
  private def unshimItem(item: String): String = item
    .replaceAll("(?i)\\bstring\\s+COMMENT\\s+'graft_jsonb'", "jsonb")
    .replaceAll("(?i)\\bstring\\s+COMMENT\\s+'graft_range_(\\w+)'", "$1")
    .replaceAll("(?i)\\b(?:int|bigint|decimal\\(20,0\\))\\s+COMMENT\\s+'graft_(uint\\d)'", "$1")
    .replaceAll("(?i)\\bbinary\\b", "bytea")

  def canonicalTable(sql: String): Option[String] = sql match {
    case CreateTableRe(name, colList, withPart) =>
      val cols = splitTop(colList).map(unshimItem).map { item =>
        // `name type [column constraints...]` — the type is one word, a
        // two/three-word ANSI spelling, or word(mods)
        val cm = ("""(?is)^("[^"]*"|[\w$]+)\s+""" +
          """((?:double\s+precision|timestamp\s+with(?:out)?\s+time\s+zone|character\s+varying|[\w]+)(?:\s*\(\s*[\d, ]+\))?)""" +
          """(\s+COLLATE\s+(?:"[^"]*"|[\w-]+))?(.*)$""").r
          .findFirstMatchIn(item).getOrElse(return None)
        val rest = cm.group(4)
        // constraints beyond NOT NULL / DEFAULT <literal> leave the regime
        if (!rest.matches("""(?is)(\s+NOT\s+NULL|\s+NULL|\s+DEFAULT\s+[^,]+)*\s*"""))
          return None
        // collation names print lowercased with underscores (the reference
        // normalizes "en-US-u-ks-level2" -> en_us_u_ks_level2); the shim's
        // Spark ICU spelling folds back to the cockroach name
        val collate = Option(cm.group(3)).map { c =>
          val n = stripQuotes(c.trim.stripPrefix("COLLATE").trim)
            .toLowerCase.replace('-', '_')
          " COLLATE " + (if (n == "en_ci_ai") "en_u_ks_level1" else n)
        }.getOrElse("")
        renderIdent(stripQuotes(cm.group(1))) + " " + pgType(cm.group(2)) +
          collate + rest.replaceAll("\\s+", " ").stripSuffix(" ")
      }
      // table-level constraints (PRIMARY KEY (...), UNIQUE, CHECK) would
      // have failed the column match above and returned None already
      val withCanon = Option(withPart).map { w =>
        val inner = w.trim.stripPrefix("WITH").trim.stripPrefix("(").stripSuffix(")")
        val opts = splitTop(inner).map { o =>
          // `RETAIN HISTORY FOR '1m'` prints as `RETAIN HISTORY = FOR '1m'`
          val om = """(?is)^(RETAIN\s+HISTORY)\s+(?:=\s*)?(.*)$""".r.findFirstMatchIn(o)
          om.map(m => s"${m.group(1).replaceAll("\\s+", " ").toUpperCase} = ${m.group(2)}")
            .getOrElse(o)
        }
        s" WITH (${opts.mkString(", ")})"
      }.getOrElse("")
      Some(s"CREATE TABLE ${qualify(name)} (${cols.mkString(", ")})$withCanon;")
    case _ => None
  }
}
