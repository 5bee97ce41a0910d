package graft

import java.nio.file.{Files, Paths}

import graft.slt.SltRunner

/** Runs a curated subset of the reference's sqllogictest corpus
  * (read directly from the read-only checkout; nothing copied) through
  * `spark.sql`. Gate: zero FAILED records — everything our dialect accepts
  * must return the right values — and a floor on total passes so silent
  * skip-inflation can't hollow the suite out.
  */
class SltCorpusSpec extends SparkSpec {

  private val corpus = "/root/reference/test/sqllogictest"

  private val files = Seq(
    "aggregates.slt", "joins.slt", "cte.slt", "subquery.slt",
    "boolean.slt", "cast.slt", "float.slt", "like.slt", "arithmetic.slt",
    "order_by.slt", "comparison.slt", "string.slt", "regex.slt",
    "distinct_from.slt", "coercion.slt", "typeof.slt", "datediff.slt",
    "dates-times.slt", "outer_join.slt", "limit_expr.slt", "funcs.slt",
    "degenerate.slt", "disambiguate_columns.slt", "char.slt", "chr.slt",
    "encode.slt", "extract.slt",
    // borrowed CockroachDB corpus (reference test/sqllogictest/cockroach/)
    "cockroach/and_or.slt", "cockroach/conditional.slt", "cockroach/where.slt",
    "cockroach/values.slt", "cockroach/distinct.slt", "cockroach/union.slt",
    "cockroach/limit.slt", "cockroach/select_table_alias.slt",
    "cockroach/suboperators.slt", "cockroach/case_sensitive_names.slt",
    "cockroach/join.slt", "cockroach/subquery_correlated.slt",
    "cockroach/select.slt", "cockroach/scale.slt", "cockroach/views.slt",
    "cockroach/tuple.slt", "cockroach/decimal.slt", "cockroach/datetime.slt")

  test("reference SLT corpus subset: 0 failures, >=200 green assertions") {
    assume(Files.isDirectory(Paths.get(corpus)), "reference corpus not present")
    val reports = SltRunner.runFiles(spark,
      files.map(f => s"$corpus/$f").filter(p => Files.exists(Paths.get(p))))
    reports.foreach(r =>
      info(f"${r.file}%-16s pass=${r.passed}%4d fail=${r.failed}%3d skip=${r.skipped}%4d"))
    val total = reports.reduce(_ + _)
    total.failures.take(25).foreach(f => info(s"FAIL: $f"))
    assert(total.failed == 0,
      s"${total.failed} SLT failures:\n${total.failures.take(25).mkString("\n")}")
    assert(total.passed >= 200, s"only ${total.passed} SLT passes")
  }
}
