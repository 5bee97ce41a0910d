package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Statistical aggregates. The reference expands stddev/variance as SQL
  * macros over sum/count arithmetic (reference `src/sql/src/func.rs` — they
  * are NOT engine aggregates, SURVEY §2.3); we do exactly the same expansion
  * here over exact decimal sums so Spark and the oracle agree bit-for-bit,
  * and additionally expose Spark's native approx sketches (the reference has
  * no HLL/percentile aggregates at all — free capability on our side).
  */
object AggregateQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Q] = Seq(

    // var/stddev via the reference's own macro expansion:
    // var = (sum(x²) - sum(x)²/n) / (n-1), over exact decimal sums.
    Q("reduce_stats",
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |           * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
        |  (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |            * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |    / (count(*) - 1) AS var_samp,
        |  sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |    / (count(*) - 1)) AS stddev_samp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val qd = col("l_quantity").cast("decimal(18,2)")
      val n = count(lit(1))
      val s1 = sum(qd).cast("double")
      val s2 = sum(qd * qd).cast("double")
      val variance = (s2 - s1 * s1 / n) / (n - lit(1))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(n.as("n"), s1.as("s1"), s2.as("s2"),
          variance.as("var_samp"), sqrt(variance).as("stddev_samp"))
    },

    // count_if / conditional aggregation.
    Q("reduce_count_if",
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count_if(col("o_totalprice") > 300000).as("n_big"),
          count_if(col("o_orderpriority").like("1%")).as("n_urgent"))
    },

    // Error-as-data (reference `src/expr/src/scalar.rs` EvalError; SURVEY
    // §2.5): scalar eval errors become NULL payload + a tagged error column
    // instead of killing the query — the changelog-friendly convention for
    // poisoned rows. try_* functions are the Spark carriers (ANSI mode is on,
    // so the un-tried forms would throw).
    Q("fn_error_as_data",
      """SELECT n,
        |  TRY_CAST(s AS INTEGER) AS maybe_int,
        |  CASE WHEN TRY_CAST(s AS INTEGER) IS NULL
        |       THEN 'invalid_integer: ' || s END AS cast_err,
        |  CASE WHEN d = 0 THEN NULL ELSE CAST(n AS DOUBLE) / d END AS maybe_div,
        |  CASE WHEN d = 0 THEN 'division_by_zero' END AS div_err
        |FROM (SELECT n,
        |        CASE WHEN n % 3 = 0 THEN CAST(n AS VARCHAR) ELSE 'x' || n END AS s,
        |        n % 5 AS d
        |      FROM (SELECT unnest(generate_series(1, 200)) AS n))""".stripMargin) { (s, _) =>
      s.range(1, 201).select(col("id").as("n"))
        .withColumn("s", when(col("n") % 3 === 0, col("n").cast("string"))
          .otherwise(concat(lit("x"), col("n").cast("string"))))
        .withColumn("d", col("n") % 5)
        .select(
          col("n"),
          expr("try_cast(s AS INT)").as("maybe_int"),
          when(expr("try_cast(s AS INT)").isNull,
            concat(lit("invalid_integer: "), col("s"))).as("cast_err"),
          expr("try_divide(CAST(n AS DOUBLE), CASE WHEN d = 0 THEN NULL ELSE d END)")
            .as("maybe_div"),
          when(col("d") === 0, lit("division_by_zero")).as("div_err"))
    },

    // Spark-native sketches — beyond the reference's capability set (it has
    // no approx aggregates). Approximate values can't hash-match an exact
    // oracle, so the query EMITS the bound check itself: each output column
    // is `sketch within tolerance of the exact value` (exact computed in the
    // same aggregation), and the oracle asserts all-TRUE. A broken sketch
    // (or a broken bound) flips a cell and the hash mismatch flags it.
    Q("reduce_approx_sketches",
      """SELECT o_orderstatus, true AS nd_ok, true AS p50_ok, true AS p99_ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_custkey"), col("o_totalprice"))
      // Pass 1: ONLY the approximate sketches (one row per group). Mixing
      // countDistinct into this aggregate plants an Expand that doubles every
      // input row through the QuantileSummaries updates — measured 4× the
      // whole query's cost.
      val sk = o.groupBy(col("o_orderstatus"))
        .agg(
          approx_count_distinct(col("o_custkey")).as("a_nd"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("a_p50"),
          percentile_approx(col("o_totalprice"), lit(0.99), lit(1000)).as("a_p99"))
      // Pass 2 — rank check instead of exact percentile(): the fraction of
      // rows at or below the approximate quantile must sit in a band around
      // the target. Verdict is exact, cost is two hash aggregations + a
      // broadcast of one row per group — the exact-percentile formulation
      // sorted every group, which is the check that would not survive 100×.
      o.join(broadcast(sk), "o_orderstatus")
        .groupBy(col("o_orderstatus"), col("a_nd"), col("a_p50"), col("a_p99"))
        .agg(
          countDistinct(col("o_custkey")).as("x_nd"),
          avg(when(col("o_totalprice") <= col("a_p50"), 1.0d).otherwise(0.0d)).as("f50"),
          avg(when(col("o_totalprice") <= col("a_p99"), 1.0d).otherwise(0.0d)).as("f99"))
        .select(col("o_orderstatus"),
          (abs(col("a_nd") - col("x_nd")) <= col("x_nd") * 0.2).as("nd_ok"),
          (col("f50") >= 0.40d && col("f50") <= 0.60d).as("p50_ok"),
          (col("f99") >= 0.97d && col("f99") <= 1.0d).as("p99_ok"))
    }
  )
}
