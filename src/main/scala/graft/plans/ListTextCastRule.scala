package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** `list::text` renders the mz-canonical `{..}` form (reference
  * strconv.rs format_list), not Spark's `[..]` cast rendering — swap the
  * Cast for the dedicated renderer during resolution. pg array-to-text
  * shares the same brace form, so plain arrays take this path too.
  * Likewise array casts whose elements cross a floating -> integral
  * boundary take pg's ROUNDING semantics (Spark truncates). */
object ListTextCastRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.trees.TreePattern
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // resolution rules run every analyzer iteration — skip whole plans
    // without casts/concats (TPC-H/bench paths) via tree-pattern bits
    if (!plan.containsAnyPattern(TreePattern.CAST, TreePattern.CONCAT))
      return plan
    // pg numeric-cast semantics are a dialect opt-in (the SLT layer sets
    // it per file); Spark API surfaces keep Spark's native cast
    val pgNumericCasts = conf.getConfString("spark.graft.pgNumericCasts",
      "false") == "true"
    lazy val mzTainted = mzTaintedIds(plan)
    plan.transformAllExpressions {
      case Cast(child, _: StringType, _, _) if child.resolved &&
          child.dataType.isInstanceOf[ArrayType] =>
        graft.functions.MzListExpressions.MzListOut(child)
      case Cast(child, _: StringType, _, _) if pgNumericCasts &&
          child.resolved &&
          child.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        // record::text renders pg composite text (dialect surfaces only —
        // Spark API users keep Spark's struct cast rendering)
        graft.functions.MzListExpressions.MzRecordOut(child)
      case Cast(child, _: StringType, _, _) if pgNumericCasts &&
          child.resolved &&
          child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        // mz numeric -> text strips trailing fraction zeros (rescale-0
        // rendering, reference numeric.rs to_string); Spark pads to scale
        graft.functions.PgNumericFunctions.MzNumericText(child)
      case Cast(child, _: StringType, _, _) if child.resolved &&
          (child.dataType match {
            // mz maps are always text-keyed; a non-text-keyed Spark map
            // (legal native SQL, e.g. cast(map(1,'a') AS STRING)) must fall
            // through to Spark's cast — renderMap reads keys as UTF8String
            // and would misread an UnsafeMapData int key slot
            case org.apache.spark.sql.types.MapType(StringType, _, _) => true
            case _ => false
          }) =>
        graft.functions.MzMapExpressions.MzMapOut(child)
      case Cast(child, at: ArrayType, _, _) if child.resolved &&
          child.dataType.isInstanceOf[ArrayType] &&
          graft.functions.MzListExpressions.crossesFloatToInt(child.dataType, at) =>
        graft.functions.MzListExpressions.MzListRoundCast(child, at)
      case c: org.apache.spark.sql.catalyst.expressions.Concat
          if c.children.length == 2 && c.children.forall(_.resolved) &&
            c.children.forall(_.dataType.isInstanceOf[ArrayType]) &&
            c.children.exists(graft.functions.PgTypeof.isListExpr) =>
        // `list || list` keeps pg NULL semantics (NULL || l == l) and
        // numeric promotion, unlike Spark's Concat (NULL-propagating)
        graft.functions.MzListExpressions.MzListCat(c.children(0), c.children(1))
      case c: org.apache.spark.sql.catalyst.expressions.Concat
          if c.children.length == 2 && c.children.forall(_.resolved) &&
            c.children.exists(e =>
              graft.functions.GraftArrayFill.boundedType(e.dataType).isDefined) &&
            c.children.forall(e =>
              e.dataType.isInstanceOf[ArrayType] ||
              graft.functions.GraftArrayFill.boundedType(e.dataType).isDefined) =>
        // `||` over a bounds-carrying array (array_fill with lower bounds)
        graft.functions.GraftBoundedCat(c.children(0), c.children(1))
      case Cast(child, to @ (org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType), _, _)
          if pgNumericCasts && child.resolved && child.foldable &&
            (child.dataType == org.apache.spark.sql.types.DoubleType ||
             child.dataType == org.apache.spark.sql.types.FloatType ||
             child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) =>
        // pg float->int rounds half-even + range-checks; numeric->int
        // rounds half away from zero (Spark truncates + wraps). Foldable
        // only: literal pipelines — column casts keep the codegen'd cast
        graft.functions.PgNumericFunctions.PgCheckedCast(child, to)
      case Cast(child, to @ (org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType), tz, mode)
          if pgNumericCasts && child.resolved && !child.foldable &&
            !child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Round] &&
            !child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BRound] &&
            (child.dataType == org.apache.spark.sql.types.DoubleType ||
             child.dataType == org.apache.spark.sql.types.FloatType ||
             child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) =>
        // column-valued casts stay whole-stage-codegen'd: pg's rounding
        // composes from built-ins — numeric->int rounds half away from
        // zero (Round), float->int half-even (BRound); Spark's cast then
        // truncates the already-integral result exactly
        val zero = org.apache.spark.sql.catalyst.expressions.Literal(0)
        val rounded =
          if (child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
            org.apache.spark.sql.catalyst.expressions.Round(child, zero)
          else org.apache.spark.sql.catalyst.expressions.BRound(child, zero)
        Cast(rounded, to, tz, mode)
      case e if pgNumericCasts && isMzTimestampContext(e, mzTainted) &&
          e.children.exists(isDateShapedLongCast) =>
        // mz_timestamp (logical millis, LongType here) compares against
        // timestamp STRINGS — `mz_now() < '3000-01-01'` coerces the
        // literal through string->bigint, which must read as epoch millis
        // (reference mz_timestamp casts, src/repr/src/timestamp.rs).
        // Fires ONLY when a sibling operand carries mz_now(): a bare
        // `SELECT '2024-01-01'::bigint` keeps the native cast (and its
        // reference 'invalid input syntax' rejection).
        e.withNewChildren(e.children.map {
          case c if isDateShapedLongCast(c) =>
            coerceDateLitToMillis(c).getOrElse(c)
          case other => other
        })
      case Cast(child, org.apache.spark.sql.types.FloatType, _, _)
          if pgNumericCasts && child.resolved && child.foldable &&
            child.dataType == org.apache.spark.sql.types.DoubleType =>
        graft.functions.PgNumericFunctions.PgCheckedCast(
          child, org.apache.spark.sql.types.FloatType)
      case Cast(child, to @ (org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType), _, _)
          if pgNumericCasts && child.resolved && child.foldable &&
            child.dataType == StringType =>
        graft.functions.PgNumericFunctions.PgCheckedCast(child, to)
      case Cast(child, dt: org.apache.spark.sql.types.DecimalType, _, _)
          if pgNumericCasts && child.resolved && child.foldable &&
            (child.dataType == org.apache.spark.sql.types.DoubleType ||
             child.dataType == org.apache.spark.sql.types.FloatType) =>
        graft.functions.PgNumericFunctions.PgCheckedCast(child, dt)
      case Cast(iv: graft.functions.PgInt2Vector, ArrayType(
          org.apache.spark.sql.types.ShortType, _), _, _) =>
        // int2vector -> int2[]: split the canonical space-joined text
        import org.apache.spark.sql.catalyst.expressions._
        val f = UnresolvedNamedLambdaVariable(Seq("graft_iv_f"))
        val t = UnresolvedNamedLambdaVariable(Seq("graft_iv_t"))
        ArrayTransform(
          ArrayFilter(
            StringSplit(iv, Literal(" "), Literal(-1)),
            LambdaFunction(Not(EqualTo(f, Literal(""))), Seq(f))),
          LambdaFunction(Cast(t, org.apache.spark.sql.types.ShortType), Seq(t)))
      case Cast(child, at: ArrayType, _, _) if child.resolved &&
          child.foldable && child.dataType == StringType =>
        // pg array_in: `'{{1,2},{3,4}}'::int[]` — the literal's own brace
        // nesting decides the Spark dimensionality (pg `int[]` names any
        // dims); parsed once at resolution time into a typed literal
        val txt = child.eval(null)
        val leaf = graft.functions.PgArrayInput.leafOf(at)
        if (txt == null)
          org.apache.spark.sql.catalyst.expressions.Literal(null, ArrayType(leaf))
        else {
          val (dt, v) = graft.functions.PgArrayInput.parseTyped(txt.toString, leaf)
          org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
        }
      case Cast(child, at: ArrayType, _, _) if child.resolved &&
          child.dataType.isInstanceOf[ArrayType] &&
          graft.functions.PgArrayInput.depthOf(child.dataType) >
            graft.functions.PgArrayInput.depthOf(at) &&
          !graft.functions.PgArrayInput.leafOf(at).isInstanceOf[ArrayType] =>
        // pg `ARRAY[ARRAY[..]]::int[]`: dims are value-level in pg — keep
        // the child's dimensionality, re-type the leaves, and apply pg's
        // zero-element normalization
        graft.functions.PgArrayInput.PgArrayRetype(
          child, graft.functions.PgArrayInput.leafOf(at))
      case Cast(child, at @ ArrayType(et, _), _, _) if child.resolved &&
          (child.dataType match {
            case ArrayType(org.apache.spark.sql.types.NullType, _) =>
              et != org.apache.spark.sql.types.NullType
            case _ => false
          }) =>
        // pg `array[]::int[]` / `ARRAY[NULL]::int[]`: Spark has no cast
        // from array<void>; element-wise null cast is always legal
        org.apache.spark.sql.catalyst.expressions.ArrayTransform(
          child,
          org.apache.spark.sql.catalyst.expressions.LambdaFunction(
            Cast(org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable(
              Seq("graft_eac_x")), et),
            Seq(org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable(
              Seq("graft_eac_x")))))
    }
  }

  import org.apache.spark.sql.catalyst.expressions._

  /** A comparison-like node in mz_timestamp context — the only place pg's
    * mz_timestamp-vs-string coercion applies. Direct: a sibling operand
    * carries mz_now(). Indirect: the bigint-typed sibling's LINEAGE traces
    * to mz_now() (a view/CTE output attribute,
    * `select x < '3000-01-01' from v`) — tracked through Project/Aggregate
    * aliases rather than plan-global mz_now() presence, so a query using
    * mz_now() in one branch while comparing an UNRELATED bigint column to
    * a date string elsewhere keeps the native cast (and its reference
    * 'invalid input syntax' rejection). */
  private def isMzTimestampContext(e: Expression, tainted: Set[Long]): Boolean =
    e match {
      case _: BinaryComparison | _: Greatest | _: Least =>
        e.children.exists(c => c.resolved &&
          c.dataType == org.apache.spark.sql.types.LongType &&
          !isDateShapedLongCast(c) && exprCarriesMzNow(c, tainted))
      case _ => false
    }

  /** The expression contains mz_now() itself, references an
    * mz_now()-derived attribute, or holds a scalar subquery whose plan
    * computes mz_now(). */
  private def exprCarriesMzNow(e: Expression, tainted: Set[Long]): Boolean =
    e.exists {
      case _: graft.functions.SessionIdentity.MzNowExpression => true
      case a: AttributeReference => tainted.contains(a.exprId.id)
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        mzTaintedIds(s.plan).nonEmpty || s.plan.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[graft.functions.SessionIdentity.MzNowExpression])))
      case _ => false
    }

  /** ExprIds of attributes whose defining alias (anywhere in the plan,
    * transitively) computes from mz_now() — the mz_timestamp-typed
    * lineage. Fixpoint over Project/Aggregate output aliases. */
  private def mzTaintedIds(plan: LogicalPlan): Set[Long] = {
    var tainted = Set.empty[Long]
    var changed = true
    while (changed) {
      changed = false
      plan.foreach { node =>
        val outs = node match {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            p.projectList
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            a.aggregateExpressions
          case _ => Nil
        }
        outs.foreach {
          case al: Alias if !tainted.contains(al.exprId.id) &&
              exprCarriesMzNow(al.child, tainted) =>
            tainted += al.exprId.id; changed = true
          case _ => ()
        }
      }
    }
    tainted
  }

  private def isDateShapedLongCast(e: Expression): Boolean = e match {
    case Cast(Literal(s, StringType), org.apache.spark.sql.types.LongType, _, _) =>
      s != null && s.toString.matches("""\d{4}-\d{2}-\d{2}([ T].*)?""")
    case _ => false
  }

  /** Epoch-millis literal for a date-shaped string cast; None when the
    * tail is unparseable (fall through to the native cast's rejection). */
  private def coerceDateLitToMillis(e: Expression): Option[Expression] = e match {
    case Cast(Literal(s, StringType), org.apache.spark.sql.types.LongType, _, _) =>
      val t = s.toString.trim.replace(' ', 'T')
      scala.util.Try {
        val ldt = java.time.LocalDateTime.parse(
          if (t.contains('T')) t else t + "T00:00:00")
        Literal(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L +
          ldt.getNano / 1000000L): Expression
      }.toOption
    case _ => None
  }
}
