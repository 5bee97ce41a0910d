package graft

import org.apache.spark.sql.functions._
import graft.streaming.Changelog

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def chg(rows: (String, Long)*) =
    rows.toDF("k", Changelog.DiffCol)

  test("negate flips multiplicities") {
    val out = Changelog.negate(chg("a" -> 2L, "b" -> -1L))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> -2L, "b" -> 1L))
  }

  test("consolidate sums diffs and drops net-zero rows") {
    val out = Changelog.consolidate(chg("a" -> 1L, "a" -> 1L, "a" -> -2L, "b" -> 3L))
      .as[(String, Long)].collect().toMap
    assert(out == Map("b" -> 3L))
  }

  test("threshold keeps only net-positive rows") {
    val out = Changelog.threshold(chg("a" -> -2L, "b" -> 3L, "c" -> 1L, "c" -> -2L))
      .as[(String, Long)].collect().toMap
    assert(out == Map("b" -> 3L))
  }

  test("toRows expands positive multiplicities") {
    val out = Changelog.toRows(chg("a" -> 2L, "b" -> 1L, "c" -> -1L))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("a", "a", "b"))
  }

  test("toRows raises on multiplicity above Int.MaxValue instead of truncating") {
    val e = intercept[Exception] {
      Changelog.toRows(chg("a" -> (Int.MaxValue.toLong + 1L))).count()
    }
    assert(e.getMessage.contains("multiplicity exceeds Int.MaxValue") ||
      Option(e.getCause).exists(_.getMessage.contains("multiplicity exceeds Int.MaxValue")))
  }

  test("union + negate + threshold implements EXCEPT ALL") {
    val a = Changelog.fromRows(Seq("x", "x", "y").toDF("k"))
    val b = Changelog.fromRows(Seq("x", "z").toDF("k"))
    val out = Changelog.toRows(Changelog.unionAll(a, Changelog.negate(b)))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("x", "y"))
  }
}
