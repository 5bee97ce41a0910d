package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Window functions. In the reference these are HIR `Windowing` expressions
  * lowered to Reduce-of-lists (reference `src/sql/src/plan/hir.rs:263-293`,
  * `lowering.rs:1377`); Spark's native `Window` operator replaces that whole
  * lowering (SURVEY §2.3). Ranking, value (lag/lead/first/last) and
  * aggregate-over-frame variants of `AggregateFunc`
  * (`src/expr/src/relation/func.rs:1960-1998`) are covered.
  *
  * Scale notes: every window here is partitioned (never a global
  * empty-partition window, which would serialize on one task); ordering keys
  * include a unique tiebreak so results are deterministic under any
  * parallelism.
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Q] = Seq(

    // RowNumber / Rank / DenseRank (func.rs:1960-1968) + percent_rank,
    // cume_dist, ntile.
    Q("window_rank",
      """SELECT o_orderkey,
        |  row_number()  OVER w AS rn,
        |  rank()         OVER w AS rk,
        |  dense_rank()   OVER w AS drk,
        |  percent_rank() OVER w AS prk,
        |  cume_dist()    OVER w AS cd,
        |  ntile(4)       OVER w AS nt
        |FROM orders WHERE o_totalprice > 495000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").filter(col("o_totalprice") > 495000)
        .select(
          col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).as("nt"))
    },

    // LagLead (func.rs:1969-1975) with explicit default.
    Q("window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1, -1.0)  OVER w AS prev_price,
        |  lead(o_totalprice, 1, -1.0) OVER w AS next_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders").filter(col("o_custkey") < 100)
          .select(
            col("o_custkey"), col("o_orderkey"),
            lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"))
    },

    // FirstValue / LastValue over an explicit frame (func.rs:1976-1981).
    Q("window_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey)  OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders").filter(col("o_custkey") < 100)
          .select(
            col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
    },

    // WindowAggregate over a ROWS frame (func.rs:1989-1993): running total +
    // moving average.
    Q("window_frame_rows",
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
        |    / count(*) OVER w3 AS moving_avg
        |FROM events WHERE user_id < 20
        |WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val base = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = base.rowsBetween(-2, Window.currentRow)
      val vDec = col("value").cast("decimal(18,2)")
      t(s, dir, "events").filter(col("user_id") < 20)
        .select(
          col("user_id"), col("event_id"),
          sum(vDec).over(run).cast("double").as("running_total"),
          (sum(vDec).over(mov).cast("double") / count(lit(1)).over(mov)).as("moving_avg"))
    },

    // WindowAggregate over a RANGE frame.
    Q("window_frame_range",
      """SELECT o_orderkey,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_close
        |FROM orders WHERE o_totalprice > 490000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-5000, Window.currentRow)
      t(s, dir, "orders").filter(col("o_totalprice") > 490000)
        .select(col("o_orderkey"), count(lit(1)).over(w).as("n_close"))
    },

    // LagLead{ignore_nulls: true} (reference func.rs:1969-1981) — the
    // explicit IGNORE NULLS variant of the analytic functions.
    Q("window_lag_ignore_nulls",
      """SELECT o_orderkey,
        |  lag(CASE WHEN o_totalprice > 200000 THEN o_totalprice END IGNORE NULLS)
        |    OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_big,
        |  first_value(CASE WHEN o_totalprice > 200000 THEN o_totalprice END IGNORE NULLS)
        |    OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS first_big
        |FROM orders WHERE o_orderkey < 2000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
      val big = when(col("o_totalprice") > 200000, col("o_totalprice"))
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          lag(big, 1, null, ignoreNulls = true).over(w).as("prev_big"),
          first(big, ignoreNulls = true).over(w).as("first_big"))
    },

    // Ordered collector: StringAgg with ORDER BY (func.rs:1928-1959). Spark
    // side: sort_array(collect_list) + array_join — deterministic regardless
    // of partitioning.
    Q("string_agg_ordered",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin) { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
    },

    // Ordered collector: ListConcat / ArrayConcat analog → sorted array agg,
    // serialized to a canonical string so the driver comparator can hash it
    // (the collected array itself is the internal representation).
    Q("array_agg_sorted",
      """SELECT o_orderpriority, array_to_string(list(s ORDER BY s), ',') AS statuses FROM
        |  (SELECT DISTINCT o_orderpriority, o_orderstatus AS s FROM orders)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus").as("s"))
        .distinct()
        .groupBy(col("o_orderpriority"))
        .agg(array_join(sort_array(collect_list(col("s"))), ",").as("statuses"))
    }
  )
}
