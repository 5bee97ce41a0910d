package graft.slt

import graft.SparkSpec

/** Unit coverage for shim edge cases fixed in round 14: the
  * INSERT-with-scalar-subquery rewrite must still receive per-cell ingest
  * canonicalization, and E-string escapes that decode to a quote must be
  * re-doubled inside the rebuilt literal. */
class SltShimSpec extends SparkSpec {

  test("E-string octal/unicode escapes decoding to a quote stay balanced") {
    val oct = SltRunner.testShim("""SELECT E'a\047b'""", crdb = false)
    assert(oct.count(_ == '\'') % 2 == 0, s"unbalanced quotes in: $oct")
    val uni = SltRunner.testShim("SELECT E'a\\u0027b'", crdb = false)
    assert(uni.count(_ == '\'') % 2 == 0, s"unbalanced quotes in: $uni")
  }

  test("INSERT VALUES with scalar subquery keeps ingest canonicalization") {
    spark.sql("DROP TABLE IF EXISTS shim_jsonb_t")
    spark.sql(
      "CREATE TABLE shim_jsonb_t (k INT, j STRING COMMENT 'graft_jsonb') USING parquet")
    try {
      // the parse-time shim turns the VALUES row into SELECT ... UNION ALL
      val shimmed = SltRunner.testShim(
        "INSERT INTO shim_jsonb_t VALUES (1, (SELECT '{\"b\":2,\"a\":1}')), (2, '{\"z\": 0}')",
        crdb = false)
      assert(shimmed.toUpperCase.contains("UNION ALL"), shimmed)
      // ...and the exec-time canonicalizer must still wrap the jsonb cell
      val canon = SltRunner.testCanonInsert(spark, shimmed)
      assert(canon.contains("jsonb_canon"), canon)
      spark.sql(canon)
      val got = spark.sql("SELECT j FROM shim_jsonb_t ORDER BY k")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("""{"a":1,"b":2}""", """{"z":0}"""), got)
    } finally spark.sql("DROP TABLE IF EXISTS shim_jsonb_t")
  }

  test("reversed window frames rewrite to the empty frame") {
    val s = SltRunner.testShim(
      "SELECT first_value(x) OVER (ORDER BY x ROWS BETWEEN 0 PRECEDING AND 1 PRECEDING) FROM t",
      crdb = false)
    assert(s.toUpperCase.contains("ROWS BETWEEN CURRENT ROW AND 1 PRECEDING"), s)
    // a well-ordered frame is untouched
    val ok = SltRunner.testShim(
      "SELECT first_value(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 0 PRECEDING) FROM t",
      crdb = false)
    assert(ok.toUpperCase.contains("ROWS BETWEEN 1 PRECEDING AND 0 PRECEDING"), ok)
  }

  test("implicit pg output name rescues bare ORDER BY references") {
    val got = SltRunner.testAliasImplicit(
      "WITH t (x, y) AS (VALUES ('a', 1)) SELECT lead(x) OVER (PARTITION BY y ORDER BY x), x FROM t ORDER BY x, lead")
    assert(got.exists(_.contains("AS lead")), got)
    // item at the END of the select list keeps a space before FROM
    val tail = SltRunner.testAliasImplicit(
      "WITH t (x, y) AS (VALUES ('a', 1)) SELECT x, last_value(x) OVER (PARTITION BY y ORDER BY x) FROM t ORDER BY last_value")
    assert(tail.exists(_.matches("(?s).*AS last_value\\s+FROM.*")), tail)
    // no unaliased matching item -> no rewrite
    assert(SltRunner.testAliasImplicit("SELECT x FROM t ORDER BY x").isEmpty)
  }

  test("window array_agg wraps per-expression, value-sorted") {
    val s = SltRunner.testShim(
      "SELECT array_agg(v) OVER (ORDER BY o1) FROM t8", crdb = true)
    assert(s.contains("OVER (ORDER BY o1"), s)
    assert(s.contains("array_sort"), s)
    assert(!s.contains("END OVER"), s)
  }

  test("plain INSERT VALUES canonicalization is unchanged") {
    spark.sql("DROP TABLE IF EXISTS shim_jsonb_p")
    spark.sql(
      "CREATE TABLE shim_jsonb_p (k INT, j STRING COMMENT 'graft_jsonb') USING parquet")
    try {
      val canon = SltRunner.testCanonInsert(spark,
        "INSERT INTO shim_jsonb_p VALUES (1, '{\"b\":2, \"a\":1}')")
      assert(canon.contains("jsonb_canon"), canon)
      spark.sql(canon)
      val got = spark.sql("SELECT j FROM shim_jsonb_p").collect().head.getString(0)
      assert(got == """{"a":1,"b":2}""", got)
    } finally spark.sql("DROP TABLE IF EXISTS shim_jsonb_p")
  }
}
