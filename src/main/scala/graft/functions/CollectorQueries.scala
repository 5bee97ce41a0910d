package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Ordered collectors and the remaining table functions
  * (reference `src/expr/src/relation/func.rs`): jsonb_agg / jsonb_object_agg
  * / map_agg with ORDER BY (func.rs:1928-1959) and the regexp_matches /
  * csv_extract table functions (func.rs:3564-3565, 3639).
  *
  * Ordered collection is `array_sort(collect_list(struct(order_key, value)))`
  * — deterministic regardless of partitioning, one shuffle; JSON
  * serialization canonicalizes the output for cross-engine comparison (and
  * IS the reference's jsonb output type).
  */
object CollectorQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Q] = Seq(

    // jsonb_agg(v ORDER BY k): JSON array of nation names ordered by key —
    // the ORDER BY column is NOT the collected value, exercising the
    // struct-sort shape.
    Q("jsonb_agg_ordered",
      """SELECT r_name, to_json(list(n_name ORDER BY n_nationkey)) AS names_json
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin) { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(to_json(expr(
          "transform(array_sort(collect_list(struct(n_nationkey, n_name))), s -> s.n_name)"))
          .as("names_json"))
    },

    // jsonb_object_agg / map_agg (k, v ORDER BY k): JSON object of
    // status → order count per priority; entry order is the sorted key
    // order in both engines.
    Q("jsonb_object_agg",
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus)
        |SELECT o_orderpriority,
        |  to_json(map_from_entries(list({'k': o_orderstatus, 'v': cnt}
        |    ORDER BY o_orderstatus))) AS status_counts
        |FROM c GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderpriority"))
        .agg(to_json(map_from_entries(array_sort(collect_list(
          struct(col("o_orderstatus").as("k"), col("cnt").as("v"))))))
          .as("status_counts"))
    },

    // Table function regexp_matches (func.rs:3639) WITH ORDINALITY: all
    // matches of a pattern, 1-based match index per document.
    Q("table_fn_regexp_matches",
      """SELECT doc_id, CAST(i AS INT) AS match_idx, ms[i] AS m
        |FROM (SELECT doc_id, regexp_extract_all(text, 'th[a-z]+') AS ms FROM documents) t,
        |LATERAL (SELECT unnest(range(1, len(ms) + 1)) AS i) u""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(expr("regexp_extract_all(text, 'th[a-z]+', 0)")).as(Seq("pos", "m")))
        .select(col("doc_id"), (col("pos") + 1).as("match_idx"), col("m"))
    },

    // Table function csv_extract(n_cols) (func.rs:3565): parse delimited
    // text into typed columns via from_csv — the oracle recovers the same
    // fields relationally.
    Q("table_fn_csv_extract",
      """SELECT n_nationkey AS k, n_name AS name, n_regionkey AS rk FROM nation""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .select(concat_ws(",", col("n_nationkey"), col("n_name"), col("n_regionkey")).as("line"))
        .select(from_csv(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, name STRING, rk BIGINT"),
          Map.empty[String, String]).as("r"))
        .select(col("r.k").as("k"), col("r.name").as("name"), col("r.rk").as("rk"))
    }
  )
}
