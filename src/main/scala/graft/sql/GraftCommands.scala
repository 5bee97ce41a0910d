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

/** `CREATE SOURCE <name> FROM LOAD GENERATOR <kind> (UP TO n)` /
  * `FROM FILE '<path>' FORMAT <fmt>` (reference CREATE SOURCE plan kind,
  * `src/sql/src/plan.rs:134`; load generators
  * `src/storage-types/src/sources/load_generator.rs`). The source becomes a
  * named relation (temp view over a lazy reader/generator DataFrame), so
  * downstream SQL — including CREATE MATERIALIZED VIEW — composes on it
  * exactly like the reference's source collections. */
case class CreateSourceCommand(
    name: String, ifNotExists: Boolean,
    spec: Either[(String, Option[Long]), (String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("type", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val registry = GraftSqlCatalog.sourcesFor(spark)
    if (registry.contains(name)) {
      if (ifNotExists) return Seq(Row(name, registry(name)))
      throw new IllegalArgumentException(
        s"source $name already exists (use IF NOT EXISTS)")
    }
    val (df, kind) = spec match {
      case Left(("AUCTION", upTo)) =>
        (graft.sources.LoadGenerator.auctionsBatch(spark, upTo.getOrElse(1000L)),
          "load-generator auction")
      case Left(("COUNTER", upTo)) =>
        (spark.range(upTo.getOrElse(1000L)).toDF("counter"), "load-generator counter")
      case Left((other, _)) =>
        throw new IllegalArgumentException(s"unknown load generator $other")
      case Right((path, "parquet")) => (spark.read.parquet(path), "file parquet")
      case Right((path, "csv")) =>
        (spark.read.option("header", "true").option("inferSchema", "true").csv(path),
          "file csv")
      case Right((path, "json")) => (spark.read.json(path), "file json")
      case Right((_, other)) =>
        throw new IllegalArgumentException(s"unsupported FORMAT $other")
    }
    df.createOrReplaceTempView(name)
    registry.put(name, kind)
    Seq(Row(name, kind))
  }
}

case class DropSourceCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val registry = GraftSqlCatalog.sourcesFor(spark)
    if (registry.remove(name).isEmpty)
      throw new IllegalArgumentException(s"source not found: $name")
    spark.catalog.dropTempView(name)
    Seq(Row(name))
  }
}

case class ShowSourcesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("type", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlCatalog.sourcesFor(spark).toSeq.sortBy(_._1)
      .map { case (n, k) => Row(n, k) }
}

case class ShowMaterializedViewsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlCatalog.forSession(spark)
    cat.viewNames.map(n => Row(n, cat.currentVersion(n).map(Long.box).orNull))
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
