package graft.tpch

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, Tables}

/** Golden plan-shape assertions for the TPC-H suite — the properties that
  * must survive a 100× scale-up, checked on the physical plan:
  *
  *  - dimension joins broadcast (region/nation/supplier/part grow
  *    sub-linearly vs lineitem at every TPC-H scale factor);
  *  - date/segment/brand filters are pushed into the parquet scans;
  *  - scans prune to the referenced columns only (no SELECT * reads).
  */
class TpchPlanSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.create("local[4]")
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    Tables.register(spark, sf)
    val df = spark.sql(TpchQueries.sql(name))
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q03: segment+date filters pushed to scans, dimension side broadcast") {
    val p = planOf("tpch_q03")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || p.contains("EqualTo(c_mktsegment,BUILDING)"), p.take(2000))
    assert(p.contains("LessThan(o_orderdate,"), p.take(2000))
  }

  test("q05: 6-way join keeps region/nation broadcast, lineitem never shuffles twice") {
    val p = planOf("tpch_q05")
    assert(p.contains("BroadcastHashJoin"))
    // region filter r_name = 'ASIA' reaches the region scan
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(3000))
  }

  test("q01: agg reads only the 7 referenced lineitem columns") {
    val p = planOf("tpch_q01")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey"), read)
    assert(read.contains("l_returnflag") && read.contains("l_quantity"), read)
    // map-side partial aggregation before the exchange
    assert(p.contains("HashAggregate") && p.contains("partial"), p.take(1500))
  }

  test("q09: p_name filter pushed; part/supplier/nation broadcast around the lineitem spine") {
    val p = planOf("tpch_q09")
    // the LIKE filter prunes part BEFORE the join (pushed to the scan),
    // so the probe side shrinks by ~selectivity at any SF
    assert(p.contains("StringContains(p_name,gear)") || p.contains("p_name"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q11: partsupp aggregate shuffles once; supplier/nation broadcast") {
    val p = planOf("tpch_q11")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // nation filter reaches the nation scan
    assert(p.contains("EqualTo(n_name,NATION_3)"), p.take(3000))
  }

  test("q03/q06: EXPLAIN FILTER PUSHDOWN reports pushed scan predicates and residuals") {
    Tables.register(spark, sf)
    def pushdown(name: String): String =
      spark.sql("EXPLAIN FILTER PUSHDOWN FOR " + TpchQueries.sql(name))
        .collect().map(_.getString(0)).mkString("\n")
    val q3 = pushdown("tpch_q03")
    // the segment and date predicates reach their parquet scans
    assert(q3.contains("EqualTo(c_mktsegment,BUILDING)"), q3)
    assert(q3.contains("LessThan(o_orderdate,"), q3)
    val q6 = pushdown("tpch_q06")
    assert(q6.contains("GreaterThanOrEqual(l_shipdate,"), q6)
    assert(q6.contains("GreaterThanOrEqual(l_discount,"), q6)
    // Spark re-evaluates pushed predicates post-scan — the residual section
    // must surface that row-level filter rather than pretending it's free
    assert(q6.contains("residual="), q6)
  }

  test("q02: lineitem scanned once; the partsupp partial-agg exchange is reused") {
    // Strict scale property for the doubly-referenced CTE: the big table is
    // read ONCE and the partsupp aggregation's shuffle feeds both consumers
    // via ReusedExchange. Asserted on the FINAL AQE plan (collect first) at
    // sf0.01 — at sf0.001 the query is empty and AQE collapses the whole
    // plan to EmptyRelation, which would vacuously pass anything.
    Tables.register(spark, "/root/testdata/sf0.01")
    val df = spark.sql(TpchQueries.sql("tpch_q02"))
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case x => x.toString
    }
    val lineitemScans = p.linesIterator.count(l =>
      l.contains("Scan") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"lineitem scanned ${lineitemScans}×:\n" + p.take(3000))
    assert(p.contains("ReusedExchange"), "partsupp exchange not reused:\n" + p.take(3000))
    Tables.register(spark, sf)
  }
}
