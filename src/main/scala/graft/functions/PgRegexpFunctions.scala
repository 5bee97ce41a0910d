package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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

  /** Replacement text -> Java. The reference implements regexp_replace over
    * the Rust regex crate (src/expr/src/scalar/func.rs), whose replacement
    * syntax is `$1` / `${1}` (and `$$` for a literal dollar) — NOT pg's
    * `\1`. Java shares the `$N` form; `${N}` unwraps, `$$` escapes, and
    * backslashes become literal. */
  private[functions] def javaReplacement(rust: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < rust.length) {
      val c = rust.charAt(i)
      if (c == '$' && i + 1 < rust.length && rust.charAt(i + 1) == '$') {
        sb.append("\\$"); i += 2
      } else if (c == '$' && i + 1 < rust.length && rust.charAt(i + 1) == '{') {
        val close = rust.indexOf('}', i + 2)
        if (close > 0) { sb.append('$').append(rust.substring(i + 2, close)); i = close + 1 }
        else { sb.append("\\$"); i += 1 }
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else { sb.append(c); i += 1 }
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
        var f = 0
        if (flags.contains('i')) f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
        if (flags.contains('n') || flags.contains('m')) f |= Pattern.MULTILINE
        if (flags.contains('s')) f |= Pattern.DOTALL
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
      val repl = javaReplacement(vs(2).toString)
      val flags = if (vs.length > 3 && vs(3) != null) vs(3).toString else ""
      val m = patternFor(re, flags).matcher(src)
      UTF8String.fromString(
        if (flags.contains('g')) m.replaceAll(repl) else m.replaceFirst(repl))
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
          s"pg_regexp_replace expects (source, pattern, replacement[, flags]), got ${args.length}")))
}
