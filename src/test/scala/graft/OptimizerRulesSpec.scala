package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.plans.MonotonicAnalysis
import graft.streaming.Changelog

/** Golden-plan tests for the custom optimizer rules (reference golden-test
  * pattern `test/sqllogictest/transform/`): assert the OPTIMIZED plan shape,
  * not just results. */
class OptimizerRulesSpec extends SparkSpec {

  private def optimizedHasAggregate(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate])

  test("reduce elision: GROUP BY unique key over one relation collapses to Project") {
    val nation = Tables.load(spark, Sf, "nation")
    val agg = nation
      .filter(col("n_regionkey") < 4)
      .groupBy(col("n_nationkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_regionkey")).as("s"),
        max(col("n_name")).as("mx"), avg(col("n_regionkey")).as("a"),
        count(col("n_name")).as("nn"))

    assert(!optimizedHasAggregate(agg), "Aggregate should be elided:\n" +
      agg.queryExecution.optimizedPlan.treeString)

    // golden shape: a Project directly over the scan (no shuffle at all)
    val physical = agg.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), s"no shuffle expected:\n$physical")

    // and the values are the single-row-group semantics
    def num(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val rows = agg.collect().map(r =>
      (num(r, 0), num(r, 1), num(r, 2), r.getString(3), r.getDouble(4), num(r, 5)))
    val expected = Tables.load(spark, Sf, "nation")
      .filter(col("n_regionkey") < 4).collect().map(r => (
        num(r, r.fieldIndex("n_nationkey")), 1L,
        num(r, r.fieldIndex("n_regionkey")),
        r.getString(r.fieldIndex("n_name")),
        num(r, r.fieldIndex("n_regionkey")).toDouble,
        if (r.isNullAt(r.fieldIndex("n_name"))) 0L else 1L))
    assert(rows.toSet == expected.toSet)
  }

  test("reduce elision does NOT fire across a join (key no longer unique)") {
    val nation = Tables.load(spark, Sf, "nation")
    val customer = Tables.load(spark, Sf, "customer")
    val agg = customer.join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"))
      .agg(count(lit(1)).as("cnt"))
    assert(optimizedHasAggregate(agg))
  }

  test("reduce elision tracks key provenance by ExprId, not by name") {
    import spark.implicits._
    val nation = Tables.load(spark, Sf, "nation")

    // a verbatim Project keeps the key pristine — still elides
    val pristine = nation.select(col("n_nationkey"), col("n_name"))
      .groupBy(col("n_nationkey")).agg(count(lit(1)).as("cnt"))
    assert(!optimizedHasAggregate(pristine))

    // a non-key column RENAMED to the key name must not elide
    val renamed = nation.select(col("n_regionkey").as("n_nationkey"), col("n_name"))
      .groupBy(col("n_nationkey")).agg(count(lit(1)).as("cnt"))
    assert(optimizedHasAggregate(renamed))
    assert(renamed.collect().map(_.getLong(1)).sum == nation.count())

    // a computed expression reusing the key name must not elide
    val computed = nation.select((col("n_nationkey") % 2).as("n_nationkey"))
      .groupBy(col("n_nationkey")).agg(count(lit(1)).as("cnt"))
    assert(optimizedHasAggregate(computed))
    assert(computed.collect().length == 2)

    // an unrelated relation reusing a registered key name (the SLT-created
    // table trap) must not elide — keys are tagged per relation signature
    val t = Seq(1, 1, 2).toDF("event_id")
    val slt = t.groupBy(col("event_id")).agg(count(lit(1)).as("cnt"))
    assert(optimizedHasAggregate(slt))
    assert(slt.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("reduce elision does NOT fire when grouping lacks the full key") {
    val nation = Tables.load(spark, Sf, "nation")
    val agg = nation.groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))
    assert(optimizedHasAggregate(agg))
  }

  test("monotonic analysis: insert-only plans are monotonic; Negate breaks it") {
    val n = Tables.load(spark, Sf, "nation")
    val appendOnly = Changelog.unionAll(
      Changelog.fromRows(n.filter(col("n_nationkey") < 5)),
      Changelog.fromRows(n.filter(col("n_nationkey") >= 5)))
    assert(MonotonicAnalysis.isMonotonic(appendOnly))

    val withRetractions = Changelog.unionAll(
      Changelog.fromRows(n),
      Changelog.negate(Changelog.fromRows(n.filter(col("n_nationkey") < 5))))
    assert(!MonotonicAnalysis.isMonotonic(withRetractions))
  }

  test("monotonic analysis is positive provenance: disguised negations do not pass") {
    val n = Tables.load(spark, Sf, "nation")
    val base = Changelog.fromRows(n)
    // the old UnaryMinus scan classified all of these as monotonic
    assert(!MonotonicAnalysis.isMonotonic(
      base.withColumn(Changelog.DiffCol, col(Changelog.DiffCol) * -1)))
    assert(!MonotonicAnalysis.isMonotonic(
      base.withColumn(Changelog.DiffCol, col(Changelog.DiffCol) - 2)))
    base.createOrReplaceTempView("mono_base")
    assert(!MonotonicAnalysis.isMonotonic(
      spark.sql("SELECT n_nationkey, n_name, n_regionkey, diff * -1 AS diff FROM mono_base")))
    // ...while sign-preserving transforms still prove
    assert(MonotonicAnalysis.isMonotonic(
      base.withColumn(Changelog.DiffCol, col(Changelog.DiffCol) * 2)))
    assert(MonotonicAnalysis.isMonotonic(
      Changelog.consolidate(base.filter(col("n_nationkey") < 10))))
  }

  test("threshold elision: provably non-negative changelog skips consolidation") {
    val n = Tables.load(spark, Sf, "nation")
    val c = Tables.load(spark, Sf, "customer")
    // a join of two insert-only changelogs with multiplied diffs — the
    // incremental-join init-term shape — cannot go negative
    val joined = Changelog.fromRows(c.select(col("c_custkey"), col("c_nationkey")))
      .join(Changelog.fromRows(n).withColumnRenamed(Changelog.DiffCol, "diff_r"),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn(Changelog.DiffCol, col(Changelog.DiffCol) * col("diff_r"))
      .drop("diff_r")
    val elided = Changelog.threshold(joined)
    assert(!optimizedHasAggregate(elided),
      "threshold over a provably non-negative plan must not aggregate:\n" +
        elided.queryExecution.optimizedPlan.treeString)

    // with a negated branch mixed in, the full consolidation must return
    val mixed = Changelog.threshold(Changelog.unionAll(
      Changelog.fromRows(n),
      Changelog.negate(Changelog.fromRows(n.filter(col("n_nationkey") < 5)))))
    assert(optimizedHasAggregate(mixed))
  }

  test("diff provenance: narrowing casts do not prove non-negativity") {
    val n = Tables.load(spark, Sf, "nation")
    val base = Changelog.fromRows(n) // diff: Long, provably ≥ 0
    // a narrowing cast can wrap a >2³¹ diff negative — must NOT prove,
    // so the threshold keeps its consolidation aggregate
    val narrowed = base.withColumn(Changelog.DiffCol,
      col(Changelog.DiffCol).cast("int").cast("long"))
    assert(!graft.plans.DiffProvenance.nonNegative(narrowed))
    // threshold must take the consolidation path (ReduceElision may still
    // soundly drop the aggregate later — nation's full key is in the
    // grouping — so assert the ANALYZED plan, i.e. which path was chosen)
    assert(Changelog.threshold(narrowed).queryExecution.analyzed
      .exists(_.isInstanceOf[Aggregate]))
    // widening casts are sign-preserving and still prove
    val intDiff = n.withColumn(Changelog.DiffCol, lit(1)) // IntegerType literal
    assert(graft.plans.DiffProvenance.nonNegative(
      intDiff.withColumn(Changelog.DiffCol, col(Changelog.DiffCol).cast("long"))))
  }

  test("union cancellation: x and negate(x) annihilate") {
    val n = Tables.load(spark, Sf, "nation")
    def pos = Changelog.fromRows(
      Tables.load(spark, Sf, "nation").filter(col("n_nationkey") < 5))
    val other = Changelog.fromRows(n.filter(col("n_nationkey") >= 20))

    // the cancelled pair never reaches execution: no Union in the plan
    val cancelled = Changelog.unionAll(pos, other, Changelog.negate(pos))
    assert(!cancelled.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union]),
      cancelled.queryExecution.optimizedPlan.treeString)
    assert(cancelled.collect().toSet == other.collect().toSet)

    // full annihilation -> the empty changelog, schema intact
    val empty = Changelog.unionAll(pos, Changelog.negate(pos))
    assert(empty.columns.toSeq == pos.columns.toSeq && empty.isEmpty)

    // DIFFERENT branches must not cancel: the Union survives and the net
    // multiset is exactly one retraction (nationkey 5)
    val different = Changelog.unionAll(pos,
      Changelog.negate(Changelog.fromRows(
        Tables.load(spark, Sf, "nation").filter(col("n_nationkey") < 6))))
    assert(different.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union]))
    val net = Changelog.consolidate(different).collect()
    assert(net.length == 1 && net.head.getAs[Long](Changelog.DiffCol) == -1L)
  }

  test("golden EXPLAIN statements lock the custom-rule plan shapes") {
    // the transform/*.slt analog: assert the EXPLAIN STATEMENT's text so
    // plan drift fails loudly through the same surface a user would read
    def explain(sql: String): String =
      spark.sql(sql).collect().map(_.getString(0)).mkString("\n")

    // reduce elision through SQL: GROUP BY the registered unique key —
    // OPTIMIZED must carry no Aggregate, PHYSICAL no Exchange
    Tables.load(spark, Sf, "nation").createOrReplaceTempView("golden_nation")
    val q = "SELECT n_nationkey, count(*) AS c FROM golden_nation GROUP BY n_nationkey"
    val opt = explain(s"EXPLAIN OPTIMIZED PLAN FOR $q")
    assert(!opt.contains("Aggregate"), s"reduce elision drifted:\n$opt")
    val phys = explain(s"EXPLAIN PHYSICAL PLAN FOR $q")
    assert(!phys.contains("Exchange"), s"elided GROUP BY must not shuffle:\n$phys")
    // a non-key grouping keeps its Aggregate (the rule must not over-fire)
    val kept = explain(
      "EXPLAIN OPTIMIZED PLAN FOR SELECT n_regionkey, count(*) AS c " +
        "FROM golden_nation GROUP BY n_regionkey")
    assert(kept.contains("Aggregate"), s"non-key grouping must aggregate:\n$kept")

    // filter pushdown reaches the parquet scan
    val push = explain(
      "EXPLAIN FILTER PUSHDOWN FOR SELECT n_name FROM golden_nation WHERE n_nationkey = 3")
    assert(push.contains("n_nationkey"), s"expected pushed filter:\n$push")

    // indexed join: PHYSICAL text over two co-bucketed relations is
    // Exchange-free (the arrangement-sharing delta-join shape)
    Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .createOrReplaceTempView("golden_orders")
    Tables.load(spark, Sf, "lineitem")
      .selectExpr("l_orderkey AS o_orderkey", "l_quantity")
      .createOrReplaceTempView("golden_lineitem")
    spark.sql("CREATE INDEX IF NOT EXISTS golden_o ON golden_orders (o_orderkey) WITH (BUCKETS 4)")
    spark.sql("CREATE INDEX IF NOT EXISTS golden_l ON golden_lineitem (o_orderkey) WITH (BUCKETS 4)")
    try {
      val joinPhys = explain(
        """EXPLAIN PHYSICAL PLAN FOR
          |SELECT o_orderpriority, count(*) AS n
          |FROM golden_orders JOIN golden_lineitem USING (o_orderkey)
          |GROUP BY o_orderpriority""".stripMargin)
      assert(!joinPhys.contains("ShuffleExchange"),
        s"indexed join must plan exchange-free:\n$joinPhys")
      assert(joinPhys.contains("SortMergeJoin") || joinPhys.contains("HashJoin"),
        s"expected a join operator:\n$joinPhys")
    } finally {
      spark.sql("DROP INDEX golden_o")
      spark.sql("DROP INDEX golden_l")
    }
  }
}
