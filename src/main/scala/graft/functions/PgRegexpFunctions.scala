package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg-semantics `regexp_replace(source, pattern, replacement[, flags])`
  * (reference `src/expr/src/scalar/func.rs` RegexpReplace; pg
  * regexp_replace): replaces the FIRST match unless the `'g'` flag is
  * given, `'i'` selects case-insensitive matching, and replacement
  * backrefs are pg's `\1`..`\9` / `\&` rather than Java's `$n`.
  *
  * Spark's builtin always replaces every match and has no flags argument —
  * a whole pg semantic family, closed by one small expression. Pattern
  * compilation caches on the (pattern, flags) pair, so constant patterns
  * (the overwhelmingly common case) compile once per partition.
  */
object PgRegexpFunctions {

  /** Expand one match's replacement text with the Rust regex crate's
    * substitution semantics (src/expr/src/scalar/func.rs RegexpReplace uses
    * `Regex::replacen`): `$1`/`${1}` are group refs (longest digit run),
    * `$$` is a literal dollar, backslashes are literal, and a reference to
    * a NONEXISTENT group substitutes the empty string — unlike Java, which
    * throws IndexOutOfBoundsException. */
  private[functions] def substitute(m: java.util.regex.Matcher, rust: String): String = {
    val sb = new StringBuilder
    def group(g: Int): Unit =
      if (g <= m.groupCount()) sb.append(Option(m.group(g)).getOrElse(""))
    def named(name: String): Unit =
      try sb.append(Option(m.group(name)).getOrElse(""))
      catch { case _: IllegalArgumentException => () } // unknown name -> empty
    var i = 0
    while (i < rust.length) {
      val c = rust.charAt(i)
      if (c == '$' && i + 1 < rust.length) {
        val n1 = rust.charAt(i + 1)
        if (n1 == '$') { sb.append('$'); i += 2 }
        else if (n1 == '{') {
          val close = rust.indexOf('}', i + 2)
          if (close > 0) {
            val name = rust.substring(i + 2, close)
            if (name.nonEmpty && name.forall(_.isDigit)) group(name.toInt)
            else if (name.nonEmpty) named(name)
            i = close + 1
          } else { sb.append('$'); i += 1 }
        } else if (n1.isDigit) {
          var j = i + 1
          while (j < rust.length && rust.charAt(j).isDigit) j += 1
          group(rust.substring(i + 1, j).toInt)
          i = j
        } else if (n1.isLetter || n1 == '_') {
          var j = i + 1
          while (j < rust.length && (rust.charAt(j).isLetterOrDigit || rust.charAt(j) == '_')) j += 1
          named(rust.substring(i + 1, j))
          i = j
        } else { sb.append('$'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  case class PgRegexpReplace(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def prettyName: String = "regexp_replace"

    @transient private var cached: (String, String, Pattern) = _

    private def patternFor(re: String, flags: String): Pattern = {
      val c = cached
      if (c != null && c._1 == re && c._2 == flags) c._3
      else {
        // the reference accepts ONLY 'g' (replace-all, handled by the
        // caller), 'i', and 'c' — with pg's last-one-wins for i/c — and
        // raises InvalidRegexFlag for anything else
        // (src/expr/src/scalar/func.rs build_regex)
        var insensitive = false
        flags.foreach {
          case 'g' => ()
          case 'i' => insensitive = true
          case 'c' => insensitive = false
          case other => throw new IllegalArgumentException(
            s"invalid regular expression flag: $other")
        }
        // the reference's regexes default dot_matches_new_line=true
        // (src/repr/src/adt/regex.rs:74-78)
        val f = Pattern.DOTALL |
          (if (insensitive) Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE else 0)
        val p = Pattern.compile(re, f)
        cached = (re, flags, p)
        p
      }
    }

    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.take(3).exists(_ == null)) return null
      val src = vs(0).toString
      val re = vs(1).toString
      val repl = vs(2).toString
      val flags = if (vs.length > 3 && vs(3) != null) vs(3).toString else ""
      val m = patternFor(re, flags).matcher(src)
      val global = flags.contains('g')
      val out = new java.lang.StringBuilder
      var last = 0
      var go = m.find()
      var first = true
      while (go && (first || global)) {
        out.append(src, last, m.start())
        out.append(substitute(m, repl))
        last = m.end()
        first = false
        go = if (global) m.find() else false
      }
      out.append(src, last, src.length)
      UTF8String.fromString(out.toString)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("pg_regexp_replace"),
      new ExpressionInfo(getClass.getName, "pg_regexp_replace"),
      (args: Seq[Expression]) =>
        if (args.length == 3 || args.length == 4) PgRegexpReplace(args)
        else throw new IllegalArgumentException(
          s"pg_regexp_replace expects (source, pattern, replacement[, flags]), got ${args.length}")),
    (new FunctionIdentifier("regexp_matches"),
      new ExpressionInfo(getClass.getName, "regexp_matches"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Explode(PgRegexpMatchesArr(args))),
    (new FunctionIdentifier("regexp_match"),
      new ExpressionInfo(getClass.getName, "regexp_match"),
      (args: Seq[Expression]) =>
        // first match (or NULL): element 1 of the non-global match list
        org.apache.spark.sql.catalyst.expressions.ElementAt(
          PgRegexpMatchesArr(args, global0 = Some(false), wholeFallback = true),
          org.apache.spark.sql.catalyst.expressions.Literal(1),
          None, failOnError = false)),
    (new FunctionIdentifier("pg_array_text"),
      new ExpressionInfo(getClass.getName, "pg_array_text"),
      (args: Seq[Expression]) => PgArrayText(args.head)))
}

/** pg `regexp_split_to_array(string, pattern[, flags])` field splitting
  * (pg regexp.c `regexp_split` semantics; reference
  * `src/expr/src/scalar/func.rs` RegexpSplitToArray): a zero-length match
  * at the start of the current field, at the end of the string, or
  * immediately after a previous match is ignored (it advances the scan by
  * one character), so empty-capable patterns split characters apart
  * without manufacturing empty fields — Java's `String.split` differs at
  * exactly those positions. Non-zero matches at the edges DO produce empty
  * fields, as in pg. */
case class PgRegexpSplit(children: Seq[Expression])
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "regexp_split_to_array"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.take(2).exists(_ == null)) return null
    val s = vs(0).toString
    val flags = if (vs.length > 2 && vs(2) != null) vs(2).toString else ""
    var f = Pattern.DOTALL // reference regex.rs dot_matches_new_line default
    // regexp_split_to_array goes through the reference's build_regex
    // (scalar/func.rs:2624-2639): 'i'/'c' toggle case-insensitivity (last
    // wins, as pg); anything else — including 'g' — is InvalidRegexFlag
    flags.foreach {
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 'c' => f &= ~(Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
      case other => throw new IllegalArgumentException(
        s"invalid regular expression flag: $other")
    }
    val m = Pattern.compile(vs(1).toString, f).matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var searchFrom = 0
    var done = false
    while (!done && searchFrom <= s.length && m.find(searchFrom)) {
      if (m.end() == m.start()) {
        if (m.start() >= s.length) done = true
        else {
          if (m.start() > start) {
            out += UTF8String.fromString(s.substring(start, m.start()))
            start = m.start()
          }
          searchFrom = m.start() + 1
        }
      } else {
        out += UTF8String.fromString(s.substring(start, m.start()))
        start = m.end()
        searchFrom = m.end()
      }
    }
    out += UTF8String.fromString(s.substring(start))
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** All matches of `pattern` in `string` as an array of per-match capture
  * arrays — the backing value for pg's `regexp_matches` SRF (one row per
  * match via Explode) and `regexp_match` (first element or NULL).
  * Per pg: a pattern without capture groups yields the whole match as the
  * single element; non-participating groups are NULL; the 'g' flag
  * selects all matches, otherwise just the first
  * (reference src/expr/src/relation/func.rs RegexpMatches). */
case class PgRegexpMatchesArr(children: Seq[Expression], global0: Option[Boolean] = None,
    wholeFallback: Boolean = false)
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = true), containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "regexp_matches"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    // strict: NULL in ANY argument (incl. flags) yields NULL, per pg
    if (vs.exists(_ == null)) return null
    val s = vs(0).toString
    val flags = if (vs.length > 2) vs(2).toString else ""
    var f = Pattern.DOTALL // reference regex.rs dot_matches_new_line default
    var global = global0.getOrElse(false)
    // two distinct reference flag parsers: the SRF regexp_matches goes
    // through AnalyzedRegexOpts (relation/func.rs:3384-3392, only 'i'/'g');
    // scalar regexp_match (wholeFallback) goes through build_regex
    // (scalar/func.rs:2624-2639, only 'i'/'c' last-wins — 'g' rejected)
    flags.foreach {
      case 'g' if !wholeFallback => global = global0.getOrElse(true)
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 'c' if wholeFallback =>
        f &= ~(Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
      case other => throw new IllegalArgumentException(
        s"invalid regular expression flag: $other")
    }
    val m = Pattern.compile(vs(1).toString, f).matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[ArrayData]
    var go = m.find()
    var first = true
    while (go && (first || global)) {
      // the reference's SRF packs ONLY capture groups (func.rs:2990 skip(1)
      // — a groupless pattern yields {}); scalar regexp_match falls back to
      // the whole match, as pg does
      val groups: Array[Any] =
        if (m.groupCount() == 0 && wholeFallback)
          Array(UTF8String.fromString(m.group()))
        else (1 to m.groupCount()).map(i =>
          Option(m.group(i)).map(UTF8String.fromString).orNull: Any).toArray
      out += new GenericArrayData(groups)
      first = false
      // zero-length match: advance by one so the scan terminates
      go = if (m.end() == m.start()) {
        if (m.end() >= s.length) false else m.find(m.end() + 1)
      } else m.find()
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** pg text rendering of a string array — `{a,b}`, quoting an element that
  * is empty, spells NULL, or contains delimiters/quotes/backslashes/
  * whitespace (pg arrays.c array_out). Used where the corpus casts an
  * array-producing expression to text. */
case class PgArrayText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType
  override def prettyName: String = "pg_array_text"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val parts = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) "NULL"
      else {
        val s = arr.getUTF8String(i).toString
        if (s.isEmpty || s.equalsIgnoreCase("null") ||
            s.exists(c => c == ',' || c == '"' || c == '\\' || c == '{' ||
              c == '}' || c.isWhitespace))
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        else s
      }
    }
    UTF8String.fromString(parts.mkString("{", ",", "}"))
  }
  override protected def withNewChildInternal(c: Expression): PgArrayText =
    copy(child = c)
}
