package graft

/** `WITH MUTUALLY RECURSIVE` SQL surface (reference
  * `doc/user/content/sql/select/recursive-ctes.md`,
  * `test/sqllogictest/with_mutually_recursive.slt`): the statements below
  * mirror the reference's own documented examples and expected values.
  */
class MutualRecursionSqlSpec extends SparkSpec {
  import spark.implicits._

  test("single recursive binding reaches its fixpoint") {
    val n = spark.sql(
      """WITH MUTUALLY RECURSIVE
        |  t (n int) AS (
        |    VALUES (1)
        |    UNION ALL
        |    SELECT n+1 FROM t WHERE n < 100
        |  )
        |SELECT sum(n) FROM t""".stripMargin).as[Long].head()
    assert(n == 5050L)
  }

  test("RETURN AT RECURSION LIMIT yields the state at the limit") {
    val n = spark.sql(
      """WITH MUTUALLY RECURSIVE (RETURN AT RECURSION LIMIT 100)
        |  t (n int) AS (
        |    VALUES (1)
        |    UNION ALL
        |    SELECT n+1 FROM t
        |  )
        |SELECT sum(n) FROM t""".stripMargin).as[Long].head()
    assert(n == 5050L)
  }

  test("ERROR AT RECURSION LIMIT raises when not converged") {
    val e = intercept[Exception](spark.sql(
      """WITH MUTUALLY RECURSIVE (ERROR AT RECURSION LIMIT 10)
        |  t (n int) AS (
        |    VALUES (1)
        |    UNION ALL
        |    SELECT n+1 FROM t
        |  )
        |SELECT sum(n) FROM t""".stripMargin).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("mutually recursive bindings (the reference's evens/odds example)") {
    val n = spark.sql(
      """WITH MUTUALLY RECURSIVE
        |  evens (n int) AS (
        |    VALUES (1)
        |    UNION ALL
        |    SELECT n+1 FROM odds WHERE n < 100
        |  ),
        |  odds (n int) AS (
        |    VALUES (0)
        |    UNION ALL
        |    SELECT n+1 FROM evens
        |  ),
        |  both (n int) AS (
        |    SELECT * FROM evens
        |    UNION ALL
        |    SELECT * FROM odds
        |  )
        |SELECT sum(n) FROM both""".stripMargin).as[Long].head()
    assert(n == 10100L)
  }

  test("unconverged WMR without a declared limit raises at the safety cap") {
    val e = intercept[Exception](spark.sql(
      """WITH MUTUALLY RECURSIVE
        |  t (n bigint) AS (
        |    VALUES (CAST(1 AS bigint))
        |    UNION ALL
        |    SELECT n+1 FROM t
        |  )
        |SELECT count(*) FROM t""".stripMargin).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("WMR as a materialized-view definition") {
    spark.sql(
      """CREATE OR REPLACE MATERIALIZED VIEW wmr_mv AS
        |WITH MUTUALLY RECURSIVE
        |  t (n int) AS (
        |    VALUES (1) UNION ALL SELECT n+1 FROM t WHERE n < 10
        |  )
        |SELECT sum(n) AS total FROM t""".stripMargin)
    assert(spark.sql("SELECT total FROM wmr_mv").as[Long].head() == 55L)
    spark.sql("DROP MATERIALIZED VIEW wmr_mv")
  }

  test("binding temp views do not leak into the session") {
    spark.sql(
      """WITH MUTUALLY RECURSIVE
        |  wmr_scope_probe (n int) AS (VALUES (1))
        |SELECT * FROM wmr_scope_probe""".stripMargin).collect()
    assert(!spark.catalog.tableExists("wmr_scope_probe"))
  }
}
