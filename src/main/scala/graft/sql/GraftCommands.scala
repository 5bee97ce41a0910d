package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sources.CopyTo

/** Runnable commands behind the SQL DDL surface (reference plan kinds
  * `CreateMaterializedView` / `Subscribe` / `CopyTo` in
  * `src/sql/src/plan.rs:134`). Each is a [[LeafRunnableCommand]], so Spark's
  * own command execution runs it — no custom strategy needed; the side
  * effects dispatch to [[graft.views.ViewCatalog]] / [[CopyTo]].
  */
case class CreateMaterializedViewCommand(
    name: String, queryText: String, replace: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlCatalog.forSession(spark)
    // plain CREATE on an existing name errors, like the reference/standard
    // SQL; only CREATE OR REPLACE overwrites
    if (!replace && cat.isDefined(name))
      throw new IllegalArgumentException(
        s"materialized view $name already exists (use CREATE OR REPLACE)")
    // the DEFINITION is the SQL text — a refresh re-parses it against live
    // inputs, exactly like the reference re-rendering the dataflow
    val v = cat.createMaterializedView(name, s => s.sql(queryText))
    // expose committed snapshots to plain SQL reads of `name`; the catalog
    // re-registers on every commit so SQL readers never pin a stale version
    cat.exposeAsTempView(name)
    Seq(Row(name, v))
  }
}

case class RefreshMaterializedViewCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlCatalog.forSession(spark)
    val v = cat.refreshFull(name)
    cat.exposeAsTempView(name)
    Seq(Row(name, v))
  }
}

case class DropMaterializedViewCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlCatalog.forSession(spark).dropView(name)
    spark.catalog.dropTempView(name)
    Seq(Row(name))
  }
}

/** `COPY <view|(query)> TO '<path>' [WITH (FORMAT ...)]` — one-shot export
  * through the DataFrame writer (distributed; no driver collect). */
case class CopyToCommand(source: Either[String, String], path: String, format: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val df = source match {
      case Left(viewName) => spark.table(viewName)
      case Right(query) => spark.sql(query)
    }
    format.toLowerCase match {
      case "parquet" => CopyTo.parquet(df, path)
      case "csv" => CopyTo.csv(df, path)
      case "json" => CopyTo.jsonLines(df, path)
      case other => throw new IllegalArgumentException(
        s"COPY TO: unsupported FORMAT '$other' (parquet|csv|json)")
    }
    Seq(Row(path))
  }
}
