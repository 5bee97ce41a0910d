package graft.views

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.streaming.Changelog

/** Driver-checked queries exercising the materialized-view lifecycle end to
  * end: create → delta batch → incremental refresh → snapshot read, with a
  * DuckDB oracle recomputing the post-delta collection from scratch
  * (reference `src/compute/src/sink/materialized_view.rs` semantics: the MV
  * contents equal the query over the updated inputs at the new timestamp).
  */
object ViewQueries {

  val defs: Seq[Q] = Seq(

    Q("mv_incremental_refresh",
      """SELECT o_orderpriority, count(*) AS support,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM (
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_totalprice >= 100000
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE o_totalprice >= 100000 AND o_orderstatus = 'P')
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val cat = new ViewCatalog(s, Files.createTempDirectory("graft-mv-q").toString)
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      val rows = orders.drop("o_orderstatus")

      // CREATE MATERIALIZED VIEW rev AS accumulable state over orders.
      cat.createMaterializedView("rev", _ =>
        Changelog.fromRows(rows)
          .groupBy(col("o_orderpriority"))
          .agg(sum(col(Changelog.DiffCol)).as("support"),
            sum(col("price") * col(Changelog.DiffCol)).as("sum_price")))

      // Delta batch: retract every order below 100k; double-insert the
      // 'P'-status orders that remain.
      val delta = Changelog.unionAll(
        Changelog.negate(Changelog.fromRows(rows.filter(col("price") < 100000))),
        Changelog.fromRows(orders
          .filter(col("price") >= 100000 && col("o_orderstatus") === "P")
          .drop("o_orderstatus")))
      cat.refreshIncrementalAccumulable("rev", delta,
        Seq("o_orderpriority"), Map("sum_price" -> "price"))

      // Snapshot read of the refreshed view.
      cat.table("rev").select(col("o_orderpriority"), col("support"),
        col("sum_price").cast("double").as("sum_val"))
    },

    // The SQL entry path end-to-end (reference
    // `doc/developer/life-of-a-query.md`): the whole lifecycle — create,
    // full refresh, versioned AS OF read — is driven by SQL text through
    // graft.sql.GraftSqlParser, no Scala API calls. AS OF 1 pins the
    // post-refresh version, so a broken refresh or version bookkeeping
    // mismatches the oracle.
    Q("sql_surface_mv",
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      s.sql(
        """CREATE MATERIALIZED VIEW sql_surface_rev AS
          |SELECT o_orderstatus, count(*) AS cnt,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY o_orderstatus""".stripMargin)
      s.sql("REFRESH MATERIALIZED VIEW sql_surface_rev")
      s.sql("SELECT o_orderstatus, cnt, total FROM sql_surface_rev AS OF 1")
    }
  )
}
