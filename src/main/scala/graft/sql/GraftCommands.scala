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
    name: String, queryText: String, replace: Boolean, ifNotExists: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(!(replace && ifNotExists),
      "OR REPLACE and IF NOT EXISTS are mutually exclusive (as in the reference)")
    val cat = GraftSqlCatalog.forSession(spark)
    if (ifNotExists && cat.isDefined(name))
      return Seq(Row(name, cat.currentVersion(name).getOrElse(-1L)))
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

/** `CREATE SINK <name> FROM <view> INTO ICEBERG '<path>' KEY (k, ...)` —
  * a continuously-maintained sink (reference `Plan::CreateSink`,
  * `src/storage/src/sink/iceberg.rs`): the view's CURRENT snapshot seeds
  * the table (recording the seeded view version as the sink's resume
  * upper), and every subsequent commit of the view feeds the post-commit
  * hook its STORED delta changelog — applied as a merge-on-read upsert plus
  * equality deletes in one idempotent Iceberg commit keyed by the view
  * version ([[graft.sources.IcebergViewSink]]). Work per refresh ∝ |delta|:
  * the hook never diffs snapshots, and a hook failure self-heals on the
  * next refresh by catching up from the sink's own recorded resume
  * position. The KEY must uniquely identify view rows. */
case class CreateSinkCommand(name: String, view: String, path: String, keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("sink", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlCatalog.forSession(spark)
    val sinks = GraftSqlCatalog.sinksFor(spark)
    if (sinks.contains(name))
      throw new IllegalArgumentException(s"sink $name already exists")
    val seedVersion = cat.currentVersion(view).getOrElse(
      throw new IllegalArgumentException(
        s"cannot CREATE SINK: no committed version of $view"))
    val snapshot = cat.table(view)
    val missing = keys.filterNot(snapshot.columns.contains)
    require(missing.isEmpty, s"KEY columns not in $view: ${missing.mkString(", ")}")
    new graft.sources.IcebergTable(spark, path)
      .create(snapshot, statsCols = keys, batchId = seedVersion)
    cat.addCommitHook(view, s"sink:$name", { (delta, _, version) =>
      graft.sources.IcebergViewSink.applyCommit(spark, cat, view, path, keys, delta, version)
    })
    sinks.put(name, (view, path, keys))
    Seq(Row(name, path))
  }
}

case class DropSinkCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("sink", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val sinks = GraftSqlCatalog.sinksFor(spark)
    sinks.remove(name) match {
      case Some((view, _, _)) =>
        GraftSqlCatalog.forSession(spark).removeCommitHook(view, s"sink:$name")
        Seq(Row(name))
      case None => throw new IllegalArgumentException(s"sink not found: $name")
    }
  }
}

case class ShowSinksCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("from", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlCatalog.sinksFor(spark).toSeq.sortBy(_._1)
      .map { case (n, (v, p, _)) => Row(n, v, p) }
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
