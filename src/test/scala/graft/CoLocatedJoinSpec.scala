package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.plans.CoLocatedJoin

/** Bucketed co-located join: both sides persisted as bucketed tables on the
  * join key → the join plan contains NO shuffle exchange (the write-time
  * arrangement is reused), and results equal the plain shuffled join.
  */
class CoLocatedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with zero exchanges") {
    val orders = Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    CoLocatedJoin.bucketize(orders, "colo_orders", "o_orderkey", 8)
    CoLocatedJoin.bucketize(lineitem, "colo_lineitem", "o_orderkey", 8)

    val joined = CoLocatedJoin.join(spark, "colo_orders", "colo_lineitem", "o_orderkey")
    val n = joined.count() // finalizes the adaptive plan

    // expected rows: every lineitem matches exactly one order
    assert(n == lineitem.count())

    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = finalPlan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.isEmpty,
      s"expected exchange-free bucketed join, found:\n$finalPlan")

    // values match the plain (shuffled) join
    val plain = orders.join(lineitem, "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == bucketed)
  }

  test("aggregation on the bucket key also skips its exchange") {
    val agg = spark.table("colo_lineitem")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    agg.count()
    val finalPlan = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(finalPlan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"expected exchange-free aggregation on bucket key:\n$finalPlan")
  }
}
