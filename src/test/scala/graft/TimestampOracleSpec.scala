package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.views.{TimestampOracle, ViewCatalog}

/** Cross-view timestamp oracle ([[graft.views.TimestampOracle]]): one global
  * clock serializes every commit in a catalog, so a reader that pins
  * `globalReadTs()` once sees a consistent cut across views that share no
  * commit group. (Reference `src/timestamp-oracle/src/lib.rs:46`.)
  */
class TimestampOracleSpec extends SparkSpec {
  import spark.implicits._

  test("pinned timestamp reads a consistent cut across independent views") {
    val cat = new ViewCatalog(spark, Files.createTempDirectory("graft-tso").toString)
    var cut = 3
    cat.createMaterializedView("va", s =>
      Tables.load(s, Sf, "nation").filter(col("n_nationkey") < cut))   // commit ts=1
    cat.createMaterializedView("vb", s =>
      Tables.load(s, Sf, "region").select(col("r_regionkey")))         // commit ts=2
    val t = cat.globalReadTs()
    cut = 10
    cat.refreshFull("va")                                              // commit ts=3
    // current read sees the refresh; the pinned cut does not
    assert(cat.table("va").count() == 10)
    assert(cat.tableAtTime("va", t).count() == 3)
    assert(cat.tableAtTime("vb", t).count() == 5)
    // a cut pinned before vb existed refuses to serve it
    intercept[IllegalArgumentException](cat.tableAtTime("vb", 1L))
    assert(cat.tableAtTime("va", 1L).count() == 3)
  }

  test("write timestamps survive catalog reopen (strictly increasing)") {
    val dir = Files.createTempDirectory("graft-tso2").toString
    val o1 = new TimestampOracle(dir)
    val a = o1.writeTs(); val b = o1.writeTs()
    assert(b == a + 1)
    val o2 = new TimestampOracle(dir) // reopened authority continues after b
    assert(o2.writeTs() > b)
    assert(o2.readTs() == b + 1)
  }

  test("group commits and singleton commits share one serialization order") {
    val cat = new ViewCatalog(spark, Files.createTempDirectory("graft-tso3").toString)
    cat.createMaterializedView("solo", s =>
      Tables.load(s, Sf, "region").select(col("r_regionkey")))          // ts=1
    cat.commitGroup("g", -1L, Map(
      "m1" -> Tables.load(spark, Sf, "nation").select(col("n_nationkey")),
      "m2" -> Tables.load(spark, Sf, "region").select(col("r_name")))) // ts=2
    val t = cat.globalReadTs()
    // both group members resolve at the pinned time alongside the singleton
    assert(cat.tableAtTime("m1", t).count() == 25)
    assert(cat.tableAtTime("m2", t).count() == 5)
    assert(cat.tableAtTime("solo", t).count() == 5)
    // before the group committed, its members are unreadable at time 1
    intercept[IllegalArgumentException](cat.tableAtTime("m1", 1L))
  }
}
