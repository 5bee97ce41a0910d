package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.Changelog
import graft.views.ViewCatalog

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): ViewCatalog =
    new ViewCatalog(spark, Files.createTempDirectory("graft-mv").toString)

  test("create + read serves the committed snapshot") {
    val cat = newCatalog()
    cat.createMaterializedView("top_nations",
      s => Tables.load(s, Sf, "nation").filter(col("n_nationkey") < 5)
        .select(col("n_nationkey"), col("n_name")))
    assert(cat.currentVersion("top_nations").contains(0L))
    assert(cat.table("top_nations").count() == 5)
  }

  test("full refresh commits a new version; readers flip atomically") {
    val cat = newCatalog()
    var limit = 5
    cat.createMaterializedView("nat", s =>
      Tables.load(s, Sf, "nation").filter(col("n_nationkey") < limit))
    val before = cat.table("nat") // resolves v=0 NOW; stays readable after flip
    limit = 10
    cat.refreshFull("nat")
    assert(cat.currentVersion("nat").contains(1L))
    assert(before.count() == 5)            // old snapshot still consistent
    assert(cat.table("nat").count() == 10) // new reads see the new version
    assert(cat.tableAt("nat", 0L).count() == 5) // AS OF old version
  }

  test("incremental accumulable refresh == full recompute after delta batch") {
    val cat = newCatalog()
    val orders = Tables.load(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice").cast("decimal(18,2)").as("price"))

    // MV = accumulable state (key, support, sum_price) over the base table.
    cat.createMaterializedView("rev_by_prio", _ =>
      Changelog.fromRows(orders)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col(Changelog.DiffCol)).as("support"),
          sum(col("price") * col(Changelog.DiffCol)).as("sum_price")))

    // Delta: retract every order below 50k, insert two synthetic orders.
    val retractions = Changelog.negate(Changelog.fromRows(orders.filter(col("price") < 50000)))
    val inserts = Changelog.fromRows(
      Seq(("1-URGENT", BigDecimal(123.45)), ("9-SYNTH", BigDecimal(67.89)))
        .toDF("o_orderpriority", "price")
        .select(col("o_orderpriority"), col("price").cast("decimal(18,2)").as("price")))
    val delta = Changelog.unionAll(retractions, inserts)

    cat.refreshIncrementalAccumulable("rev_by_prio", delta,
      Seq("o_orderpriority"), Map("sum_price" -> "price"))

    // Oracle: full recompute over the post-delta collection.
    val expected = orders.filter(col("price") >= 50000)
      .unionByName(inserts.drop(Changelog.DiffCol))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("support"), sum(col("price")).as("sum_price"))
      .collect().map(r => (r.getString(0), r.getLong(0 + 1), r.getDecimal(2)))
      .toSet
    val got = cat.table("rev_by_prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .toSet
    assert(got == expected)
  }

  test("vacuum drops superseded versions, keeps current") {
    val cat = newCatalog()
    cat.createMaterializedView("n", s => Tables.load(s, Sf, "nation"))
    cat.refreshFull("n")
    cat.refreshFull("n")
    cat.vacuum("n")
    assert(cat.currentVersion("n").contains(2L))
    assert(cat.table("n").count() == 25)
  }
}
