package graft

/** pg range semantics (reference src/repr/src/adt/range.rs; oracle values
  * from test/sqllogictest/range.slt). */
class RangeSpec extends SparkSpec {
  import spark.implicits._

  private def one(sql: String): String = {
    val r = spark.sql(sql).collect().head
    if (r.isNullAt(0)) null else r.get(0).toString
  }

  test("cast parse + canonicalization per kind") {
    assert(one("SELECT pg_int4range('[0,100)')") == "[0,100)")
    assert(one("SELECT pg_int4range('empty')") == "empty")
    assert(one("SELECT pg_int4range('(,]')") == "(,)")
    assert(one("SELECT pg_int4range('(,-1]')") == "(,0)")
    assert(one("SELECT pg_int4range('(-1,)')") == "[0,)")
    assert(one("SELECT pg_int4range('(-1,-1)')") == "empty")
    assert(one("SELECT pg_int4range('[,1)')") == "(,1)")
    assert(one("SELECT pg_numrange('[1.1,1.1]')") == "[1.1,1.1]")
    assert(one("SELECT pg_numrange('[1.1,1.1)')") == "empty")
    assert(one("SELECT pg_daterange('[1970-01-01,62143-12-30)')") == "[1970-01-01,62143-12-30)")
    assert(one("SELECT pg_daterange('(1969-12-31,1970-01-02]')") == "[1970-01-01,1970-01-03)")
    assert(one("SELECT pg_tsrange('[1970-01-01 00:00:00,1971-01-01 00:00:00)')")
      == "[\"1970-01-01 00:00:00\",\"1971-01-01 00:00:00\")")
    assert(one("SELECT pg_tstzrange('(,1969-12-31 11:59:59]')")
      == "(,\"1969-12-31 11:59:59+00\"]")
    assert(one("SELECT pg_int4range(NULL)") == null)
    intercept[Exception](one("SELECT pg_int4range('[2,2147483647]')"))
    intercept[Exception](one("SELECT pg_int4range('garbage[')"))
    intercept[Exception](one("SELECT pg_numrange('[2,1]')"))
  }

  test("constructors with flags") {
    assert(one("SELECT int4range(-1, 1)") == "[-1,1)")
    assert(one("SELECT int4range(-1, 1, '[]')") == "[-1,2)")
    assert(one("SELECT int4range(-1, 1, '()')") == "[0,1)")
    assert(one("SELECT int4range(0, 0, '[]')") == "[0,1)")
    assert(one("SELECT int4range(1, NULL)") == "[1,)")
    assert(one("SELECT int4range(NULL, 1)") == "(,1)")
    assert(one("SELECT numrange(1.1, 1.2)") == "[1.1,1.2)")
    assert(one("SELECT numrange(CAST(1.10 AS DECIMAL(38,2)), CAST(1.2 AS DECIMAL(38,1)))")
      == "[1.1,1.2)")
    assert(one("SELECT daterange('1969-12-31','1970-01-01','[]')")
      == "[1969-12-31,1970-01-02)")
    intercept[Exception](one("SELECT int4range(1, 2, NULL)"))
    intercept[Exception](one("SELECT int4range(1, 2, '(,]')"))
  }

  test("union / intersect / minus") {
    assert(one("SELECT range_union(pg_int4range('[1,3)'), pg_int4range('[3,5)'))") == "[1,5)")
    assert(one("SELECT range_union(pg_int4range('empty'), pg_int4range('[1,3)'))") == "[1,3)")
    intercept[Exception](
      one("SELECT range_union(pg_int4range('[1,2)'), pg_int4range('[5,6)'))"))
    assert(one("SELECT range_intersect(pg_int4range('[1,5)'), pg_int4range('[3,9)'))") == "[3,5)")
    assert(one("SELECT range_intersect(pg_int4range('[1,2)'), pg_int4range('[5,6)'))") == "empty")
    assert(one("SELECT range_minus(pg_int8range('[-2,2)'), pg_int8range('(,-1)'))") == "[-1,2)")
    assert(one("SELECT range_minus(pg_int8range('[1,)'), pg_int8range('[-2,2)'))") == "[2,)")
    assert(one("SELECT range_minus(pg_int8range('(,)'), pg_int8range('(,-1)'))") == "[-1,)")
    assert(one("SELECT range_minus(pg_numrange('[1,5]'), pg_numrange('[5,9)'))") == "[1,5)")
    intercept[Exception](
      one("SELECT range_minus(pg_int8range('(,)'), pg_int8range('[-2,2)'))"))
  }

  test("predicates, cmp and accessors") {
    assert(one("SELECT range_contains_elem(pg_int4range('[1,5)'), 4)") == "true")
    assert(one("SELECT range_contains_elem(pg_int4range('[1,5)'), 5)") == "false")
    assert(one("SELECT range_contains(pg_int4range('(,)'), pg_int4range('[1,5)'))") == "true")
    assert(one("SELECT range_contains(pg_int4range('[1,5)'), pg_int4range('empty'))") == "true")
    assert(one("SELECT range_overlaps(pg_int4range('[1,5)'), pg_int4range('[4,9)'))") == "true")
    assert(one("SELECT range_before(pg_int4range('[1,3)'), pg_int4range('[4,9)'))") == "true")
    assert(one("SELECT range_adjacent(pg_int4range('[1,3)'), pg_int4range('[3,9)'))") == "true")
    assert(one("SELECT range_cmp(pg_int4range('empty'), pg_int4range('(,1)'))").toInt < 0)
    assert(one("SELECT range_cmp(pg_int4range('(,1)'), pg_int4range('[-1,1)'))").toInt < 0)
    assert(one("SELECT range_cmp(pg_int4range('[1,3)'), pg_int4range('[1,3)'))").toInt == 0)
    assert(one("SELECT range_lower(pg_int4range('[1,5)'))") == "1")
    assert(one("SELECT range_upper(pg_tsrange('(,1970-01-01 00:00:01]'))")
      == "1970-01-01 00:00:01")
    assert(one("SELECT isempty(pg_int4range('[1,1)'))") == "true")
    assert(one("SELECT lower_inc(pg_numrange('(1,2]'))") == "false")
    assert(one("SELECT upper_inc(pg_numrange('(1,2]'))") == "true")
    assert(one("SELECT lower_inf(pg_int4range('(,1)'))") == "true")
    assert(one("SELECT upper_inf(pg_int4range('(,1)'))") == "false")
  }

  test("range_sort_key orders like pg") {
    val vals = Seq("empty", "(,1)", "(,2)", "(,)", "[-1,1)", "[-1,2)", "[0,1)",
      "[0,2)", "[1,)", "[2,)")
    val shuffled = scala.util.Random.shuffle(vals)
    shuffled.toDF("r").createOrReplaceTempView("rngsort")
    val sorted = spark.sql(
      "SELECT r FROM rngsort ORDER BY range_sort_key(pg_int4range(r))")
      .as[String].collect().toSeq
    assert(sorted.map(s => one(s"SELECT pg_int4range('$s')")) ==
      vals.map(s => one(s"SELECT pg_int4range('$s')")))
  }
}
