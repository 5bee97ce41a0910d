package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.{CollectorQueries, FunctionQueries, PgFunctionQueries}
import graft.multimodal.MultimodalQueries
import graft.operators.{AggregateQueries, RelationalQueries, SqlQueries, WindowQueries}
import graft.similarity.SimilarityQueries
import graft.sources.{SinkQueries, SourceQueries}
import graft.streaming.{StreamExecQueries, StreamingQueries}
import graft.text.TextQueries
import graft.tpch.TpchQueries
import graft.views.ViewQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain query inventories; each `queries` key has a
  * DuckDB-runnable oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a weaker rows-only check).
  */
object SparkEntry {

  private def all: Seq[Q] =
    RelationalQueries.defs ++ WindowQueries.defs ++ SqlQueries.defs ++
      AggregateQueries.defs ++
      FunctionQueries.defs ++ CollectorQueries.defs ++ PgFunctionQueries.defs ++
      TpchQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ StreamingQueries.defs ++ StreamExecQueries.defs ++
      ViewQueries.defs ++ SourceQueries.defs ++ SinkQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
