package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface for `WITH MUTUALLY RECURSIVE` — the reference's signature
  * recursive-SQL construct (parser `src/sql-parser/src/parser.rs` CTE
  * handling; planning `src/sql/src/plan/query.rs` `plan_mutually_recursive`;
  * semantics `doc/user/content/sql/select/recursive-ctes.md`):
  *
  * ```sql
  * WITH MUTUALLY RECURSIVE [(RETURN|ERROR AT RECURSION LIMIT n)]
  *   name (col type, ...) AS ( query ),
  *   ...
  * body
  * ```
  *
  * Semantics carried over: every binding starts EMPTY; each iteration
  * re-evaluates the bindings in definition order, each seeing the most
  * recent value of every binding (including those updated earlier in the
  * same iteration — the reference's sequential-update rule); iteration
  * stops when a full round changes nothing (multiset equality) or at the
  * declared recursion limit — `RETURN AT` yields the current state,
  * `ERROR AT` raises, and hitting the safety cap without a declared limit
  * raises (a non-terminating WMR is a bug, not a hang).
  *
  * Spark-first: bindings live as temp views; each round is distributed
  * (`exceptAll` change detection, `localCheckpoint` lineage truncation —
  * the same machinery as [[graft.plans.Recursion]]); the driver only
  * orchestrates. Evaluation is eager at parse time (the [[SubscribeFrame]]
  * precedent) so the statement composes with everything that accepts SQL
  * text, including CREATE MATERIALIZED VIEW.
  */
object MutualRecursionSql {

  /** Safety cap when no RECURSION LIMIT is declared. */
  val DefaultMaxIter = 200

  final case class Binding(name: String, schemaDdl: String, query: String)
  final case class Wmr(limit: Option[Int], errorAtLimit: Boolean,
      bindings: Seq[Binding], body: String)

  def matches(sqlText: String): Boolean =
    """(?is)^\s*WITH\s+MUTUALLY\s+RECURSIVE\b""".r.findFirstIn(sqlText).isDefined

  /** Execute the statement and return the body's DataFrame. */
  def run(spark: SparkSession, sqlText: String): DataFrame = {
    val wmr = parse(sqlText)
    // every binding starts as the empty collection of its declared type.
    // Bare NUMERIC/DECIMAL declarations get the reference's wide numeric
    // (Spark's bare DECIMAL is (10,0), which would truncate fractions).
    val schemas = wmr.bindings.map { b =>
      val ddl = """(?i)\b(numeric|decimal)\b(?!\s*\()""".r
        .replaceAllIn(b.schemaDdl, "DECIMAL(38,18)")
      b.name -> spark.sessionState.sqlParser.parseTableSchema(ddl)
    }.toMap
    wmr.bindings.foreach { b =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemas(b.name))
        .createOrReplaceTempView(b.name)
    }
    // bindings are lexically scoped in the reference: whatever happens below
    // (non-convergence throw, analysis error in a binding or the body), the
    // binding temp views must not leak into the session namespace. A
    // pre-existing same-name temp view is shadowed-then-dropped — documented
    // limitation.
    try runBody(spark, wmr, schemas)
    finally wmr.bindings.foreach(b => spark.catalog.dropTempView(b.name))
  }

  private def runBody(spark: SparkSession, wmr: Wmr,
      schemas: Map[String, org.apache.spark.sql.types.StructType]): DataFrame = {
    val maxIter = wmr.limit.getOrElse(DefaultMaxIter)
    // One round: sequential re-evaluation of every binding — each sees
    // bindings already updated in THIS round through their refreshed temp
    // views (lazily; plans nest within the batch). Results are coerced to
    // the DECLARED column names and types (the reference plans each binding
    // against its signature).
    def round(): Map[String, DataFrame] =
      wmr.bindings.map { b =>
        val raw = spark.sql(b.query)
        val schema = schemas(b.name)
        require(raw.columns.length == schema.length,
          s"binding ${b.name} declares ${schema.length} columns, query returns ${raw.columns.length}")
        // the reference type-checks each binding against its declared
        // signature: a text/unknown literal does NOT coerce into a numeric
        // column ("declared types (bigint), but query returns types
        // (text)", with_mutually_recursive.slt:653); numeric widths
        // assignment-cast with range checks, which the coercion below
        // already applies
        raw.schema.fields.zip(schema.fields).foreach { case (got, decl) =>
          import org.apache.spark.sql.types._
          if (got.dataType == StringType && decl.dataType != StringType)
            throw new IllegalArgumentException(
              s"""WITH MUTUALLY RECURSIVE query "${b.name}" declared types """ +
                s"(${decl.dataType.simpleString}), but query returns types (text)")
        }
        val coerced = raw.select(raw.columns.toIndexedSeq.zip(schema.fields).map {
          case (c, f) =>
            org.apache.spark.sql.functions.col(s"`$c`").cast(f.dataType).as(f.name)
        }: _*).localCheckpoint(false)
        coerced.createOrReplaceTempView(b.name)
        b.name -> coerced
      }.toMap
    // Driver round-trips, not data, dominate small fixpoints — so batch K
    // lazy rounds per materialized check. The check compares the batch's
    // LAST TWO consecutive rounds: X^{k} == X^{k-1} is the exact fixpoint
    // condition (no inflationary assumption needed — a fixpoint reached
    // mid-batch stays fixed, so the boundary check still sees it), at the
    // cost of up to K-1 extra lazy rounds of plan building. One job per
    // batch: the lazy checkpoints of every round materialize inside it.
    val batchK = 8
    var cur: Map[String, DataFrame] = Map.empty
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val k = math.min(batchK, maxIter - i)
      var prevRound = cur
      var lastRound = cur
      (1 to k).foreach { _ =>
        prevRound = lastRound
        lastRound = round()
      }
      // per binding: ONE +1/-1 sum aggregation (multiset symmetric
      // difference ≠ empty) instead of two exceptAll anti-joins — one
      // exchange per binding, not four
      import org.apache.spark.sql.functions.{col, lit, sum}
      val diffs = wmr.bindings.flatMap { b =>
        prevRound.get(b.name).map { prev =>
          val last = lastRound(b.name)
          val cols = last.columns.toIndexedSeq.map(c => col(s"`$c`"))
          last.withColumn("__graft_sign", lit(1L))
            .union(prev.withColumn("__graft_sign", lit(-1L)))
            .groupBy(cols: _*)
            .agg(sum(col("__graft_sign")).as("__graft_sign"))
            .filter(col("__graft_sign") =!= 0L)
            .select(lit(1).as("one"))
        }
      }
      converged = diffs.size == wmr.bindings.size &&
        diffs.reduce(_ unionByName _).isEmpty
      cur = lastRound
      i += k
    }
    if (!converged) {
      if (wmr.errorAtLimit || wmr.limit.isEmpty)
        throw new IllegalStateException(
          s"WITH MUTUALLY RECURSIVE did not converge within $maxIter iterations" +
            (if (wmr.limit.isEmpty) " (no RECURSION LIMIT declared)" else ""))
      // RETURN AT RECURSION LIMIT: current state is the result
    }
    val out = spark.sql(wmr.body)
    out.queryExecution.analyzed // force resolution against the binding views
    out
  }

  // ---- parsing (paren- and quote-aware scanner) ---------------------------

  def parse(sqlText: String): Wmr = {
    val s = sqlText
    val m = """(?is)^\s*WITH\s+MUTUALLY\s+RECURSIVE\s*""".r
      .findFirstMatchIn(s).getOrElse(
        throw new IllegalArgumentException("not a WITH MUTUALLY RECURSIVE statement"))
    var i = m.end
    var limit: Option[Int] = None
    var errorAt = false
    // optional (RETURN|ERROR AT RECURSION LIMIT n)
    if (i < s.length && s(i) == '(') {
      val opt = balanced(s, i)
      """(?is)^\(\s*(RETURN|ERROR)\s+AT\s+RECURSION\s+LIMIT\s*=?\s*(\d+)\s*\)$""".r
        .findFirstMatchIn(opt) match {
        case Some(om) =>
          limit = Some(om.group(2).toInt)
          errorAt = om.group(1).equalsIgnoreCase("ERROR")
          i += opt.length
        case None => () // not an options paren; leave for binding parse
      }
    }
    val bindings = Seq.newBuilder[Binding]
    var done = false
    while (!done) {
      i = skipWs(s, i)
      val name = ident(s, i).getOrElse(
        throw new IllegalArgumentException(s"expected binding name at: ${s.drop(i).take(40)}"))
      i = skipWs(s, i + name.length)
      require(i < s.length && s(i) == '(',
        s"expected (columns) after binding $name")
      val cols = balanced(s, i); i = skipWs(s, i + cols.length)
      val asKw = """(?is)^AS\s*""".r.findFirstMatchIn(s.substring(i)).getOrElse(
        throw new IllegalArgumentException(s"expected AS after binding $name columns"))
      i = skipWs(s, i + asKw.end)
      require(i < s.length && s(i) == '(', s"expected ( query ) for binding $name")
      val q = balanced(s, i); i = skipWs(s, i + q.length)
      bindings += Binding(name, cols.substring(1, cols.length - 1),
        q.substring(1, q.length - 1))
      if (i < s.length && s(i) == ',') i += 1 else done = true
    }
    val body = s.substring(i).trim.stripSuffix(";")
    require(body.nonEmpty, "WITH MUTUALLY RECURSIVE has no body")
    Wmr(limit, errorAt, bindings.result(), body)
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s(i).isWhitespace ||
        (s(i) == '-' && i + 1 < s.length && s(i + 1) == '-'))) {
      if (s(i) == '-') { while (i < s.length && s(i) != '\n') i += 1 }
      else i += 1
    }
    i
  }

  private def ident(s: String, from: Int): Option[String] =
    """^[A-Za-z_][A-Za-z0-9_]*""".r.findFirstIn(s.substring(from))

  /** The balanced `(...)` group starting at `s(open)`, quote-aware. */
  private def balanced(s: String, open: Int): String = {
    require(s(open) == '(')
    var depth = 0
    var i = open
    var inQ = false
    var qc = ' '
    while (i < s.length) {
      val c = s(i)
      if (inQ) { if (c == qc) inQ = false }
      else c match {
        case '\'' | '"' => inQ = true; qc = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return s.substring(open, i + 1)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced parentheses starting at: ${s.drop(open).take(40)}")
  }
}
