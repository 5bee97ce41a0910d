package graft

import graft.plans.NestedCorrelationFlatten

/** Multi-level correlated subquery flattening (plans/
  * NestedCorrelationFlatten): queries Spark's analyzer rejects with
  * UNRESOLVED_COLUMN run after the rewrite, and their results match the
  * semantics pg/the reference give them. */
class NestedCorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): Unit = {
    Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("a", "x").createOrReplaceTempView("nc_t1")
    Seq((100, 1), (200, 2)).toDF("b", "y").createOrReplaceTempView("nc_t2")
    Seq((1, 100), (3, 300)).toDF("a", "b").createOrReplaceTempView("nc_t3")
  }

  test("two-level correlated EXISTS-in-EXISTS") {
    setup()
    val sql = """SELECT a FROM nc_t1 t1 WHERE EXISTS (
                   SELECT 1 FROM nc_t2 t2 WHERE EXISTS (
                     SELECT 1 FROM nc_t3 t3 WHERE t1.a = t3.a AND t2.b = t3.b))
                 ORDER BY a"""
    intercept[Throwable](spark.sql(sql).collect())
    val df = NestedCorrelationFlatten.rescue(spark, sql).get
    // only t3 row (1,100) has a matching t2.b: qualifies a=1
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("two-level correlated NOT EXISTS inner") {
    setup()
    val sql = """SELECT a FROM nc_t1 t1 WHERE EXISTS (
                   SELECT 1 FROM nc_t2 t2 WHERE NOT EXISTS (
                     SELECT 1 FROM nc_t3 t3 WHERE t1.a = t3.a AND t2.b = t3.b))
                 ORDER BY a"""
    intercept[Throwable](spark.sql(sql).collect())
    val df = NestedCorrelationFlatten.rescue(spark, sql).get
    // every a has SOME t2 row with no t3 match (b=200 never matches) -> all
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
  }

  test("two-level correlated IN inner") {
    setup()
    val sql = """SELECT a FROM nc_t1 t1 WHERE EXISTS (
                   SELECT 1 FROM nc_t2 t2 WHERE t2.b IN (
                     SELECT t3.b FROM nc_t3 t3 WHERE t3.a = t1.a))
                 ORDER BY a"""
    intercept[Throwable](spark.sql(sql).collect())
    val df = NestedCorrelationFlatten.rescue(spark, sql).get
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("scalar subquery context keeps multiplicity (semi join, not cross)") {
    setup()
    val sql = """SELECT a, (SELECT count(*) FROM nc_t2 t2 WHERE EXISTS (
                   SELECT 1 FROM nc_t3 t3 WHERE t1.a = t3.a AND t2.b = t3.b)) AS c
                 FROM nc_t1 t1 ORDER BY a"""
    intercept[Throwable](spark.sql(sql).collect())
    val df = NestedCorrelationFlatten.rescue(spark, sql).get
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 1L), (2, 0L), (3, 0L), (4, 0L)))
  }

  test("ungrouped aggregate inner EXISTS is refused (always-one-row semantics)") {
    setup()
    // EXISTS(SELECT max(..)..) is TRUE regardless of matches; flattening it
    // would be wrong, so the rescue must decline (rewrite unchanged)
    val sql = """SELECT a FROM nc_t1 t1 WHERE EXISTS (
                   SELECT 1 FROM nc_t2 t2 WHERE EXISTS (
                     SELECT max(t3.b) FROM nc_t3 t3 WHERE t1.a = t3.a AND t2.b = t3.b))"""
    assert(NestedCorrelationFlatten.rescue(spark, sql).isEmpty)
  }

  test("three-level EXISTS chain flattens recursively") {
    setup()
    val sql = """SELECT a FROM nc_t1 t1 WHERE EXISTS (
                   SELECT 1 FROM nc_t2 t2 WHERE EXISTS (
                     SELECT 1 FROM nc_t3 t3 WHERE EXISTS (
                       SELECT 1 FROM nc_t2 t2b
                       WHERE t1.a = t3.a AND t2.b = t3.b AND t2b.b = t3.b)))
                 ORDER BY a"""
    intercept[Throwable](spark.sql(sql).collect())
    val df = NestedCorrelationFlatten.rescue(spark, sql).get
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }
}
