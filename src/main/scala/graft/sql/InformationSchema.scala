package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL-standard `information_schema.tables` / `information_schema.columns`
  * over the engine catalog (reference `src/catalog/src/builtin.rs:36`
  * information_schema module; the builtin listing below is the reference's
  * own ambient catalog — every mz_catalog / mz_internal / mz_introspection /
  * pg_catalog / information_schema relation it ships, with the table_type
  * each reports). User relations are appended dynamically from the session:
  * tables as BASE TABLE, views as VIEW, materialized views as MATERIALIZED
  * VIEW, sources as SOURCE — catalog `materialize`, schema `public`.
  */
object InformationSchema {

  /** (table_schema, table_name, table_type) for the reference's ambient
    * relations — static public catalog metadata, driver-side only. */
  private val builtinRows: Seq[(String, String, String)] = Seq(
    ("information_schema", "applicable_roles", "VIEW"),
    ("information_schema", "character_sets", "VIEW"),
    ("information_schema", "columns", "VIEW"),
    ("information_schema", "enabled_roles", "VIEW"),
    ("information_schema", "key_column_usage", "VIEW"),
    ("information_schema", "referential_constraints", "VIEW"),
    ("information_schema", "role_table_grants", "VIEW"),
    ("information_schema", "routines", "VIEW"),
    ("information_schema", "schemata", "VIEW"),
    ("information_schema", "table_constraints", "VIEW"),
    ("information_schema", "table_privileges", "VIEW"),
    ("information_schema", "tables", "VIEW"),
    ("information_schema", "triggers", "VIEW"),
    ("information_schema", "views", "VIEW"),
    ("mz_catalog", "mz_array_types", "BASE TABLE"),
    ("mz_catalog", "mz_audit_events", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_aws_privatelink_connections", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_base_types", "BASE TABLE"),
    ("mz_catalog", "mz_cluster_replica_frontiers", "SOURCE"),
    ("mz_catalog", "mz_cluster_replica_sizes", "BASE TABLE"),
    ("mz_catalog", "mz_cluster_replicas", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_clusters", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_columns", "BASE TABLE"),
    ("mz_catalog", "mz_connections", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_databases", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_default_privileges", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_egress_ips", "BASE TABLE"),
    ("mz_catalog", "mz_functions", "BASE TABLE"),
    ("mz_catalog", "mz_iceberg_sinks", "BASE TABLE"),
    ("mz_catalog", "mz_index_columns", "BASE TABLE"),
    ("mz_catalog", "mz_indexes", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_kafka_connections", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_kafka_sinks", "BASE TABLE"),
    ("mz_catalog", "mz_kafka_sources", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_list_types", "BASE TABLE"),
    ("mz_catalog", "mz_map_types", "BASE TABLE"),
    ("mz_catalog", "mz_materialized_views", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_objects", "VIEW"),
    ("mz_catalog", "mz_operators", "BASE TABLE"),
    ("mz_catalog", "mz_pseudo_types", "BASE TABLE"),
    ("mz_catalog", "mz_recent_storage_usage", "VIEW"),
    ("mz_catalog", "mz_relations", "VIEW"),
    ("mz_catalog", "mz_role_auth", "BASE TABLE"),
    ("mz_catalog", "mz_role_members", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_role_parameters", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_roles", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_schemas", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_secrets", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_sinks", "BASE TABLE"),
    ("mz_catalog", "mz_sources", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_ssh_tunnel_connections", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_storage_usage", "VIEW"),
    ("mz_catalog", "mz_system_privileges", "MATERIALIZED VIEW"),
    ("mz_catalog", "mz_tables", "BASE TABLE"),
    ("mz_catalog", "mz_timezone_abbreviations", "VIEW"),
    ("mz_catalog", "mz_timezone_names", "VIEW"),
    ("mz_catalog", "mz_types", "BASE TABLE"),
    ("mz_catalog", "mz_views", "BASE TABLE"),
    ("mz_internal", "mz_activity_log_thinned", "VIEW"),
    ("mz_internal", "mz_aggregates", "BASE TABLE"),
    ("mz_internal", "mz_aws_connections", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_aws_privatelink_connection_status_history", "SOURCE"),
    ("mz_internal", "mz_aws_privatelink_connection_statuses", "VIEW"),
    ("mz_internal", "mz_builtin_materialized_views", "VIEW"),
    ("mz_internal", "mz_builtin_sources", "VIEW"),
    ("mz_internal", "mz_catalog_raw", "SOURCE"),
    ("mz_internal", "mz_cluster_auto_scaling_strategies", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_cluster_deployment_lineage", "VIEW"),
    ("mz_internal", "mz_cluster_reconfigurations", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_cluster_replica_history", "VIEW"),
    ("mz_internal", "mz_cluster_replica_metrics", "VIEW"),
    ("mz_internal", "mz_cluster_replica_metrics_history", "SOURCE"),
    ("mz_internal", "mz_cluster_replica_name_history", "VIEW"),
    ("mz_internal", "mz_cluster_replica_size_internal", "BASE TABLE"),
    ("mz_internal", "mz_cluster_replica_status_history", "SOURCE"),
    ("mz_internal", "mz_cluster_replica_statuses", "VIEW"),
    ("mz_internal", "mz_cluster_replica_utilization", "VIEW"),
    ("mz_internal", "mz_cluster_replica_utilization_history", "VIEW"),
    ("mz_internal", "mz_cluster_schedules", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_cluster_system_parameters", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_cluster_workload_classes", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_comments", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_compute_dependencies", "SOURCE"),
    ("mz_internal", "mz_compute_error_counts_raw_unified", "SOURCE"),
    ("mz_internal", "mz_compute_hydration_statuses", "VIEW"),
    ("mz_internal", "mz_compute_hydration_times", "SOURCE"),
    ("mz_internal", "mz_compute_operator_hydration_statuses", "SOURCE"),
    ("mz_internal", "mz_console_cluster_utilization_overview", "VIEW"),
    ("mz_internal", "mz_console_cluster_utilization_overview_24h", "VIEW"),
    ("mz_internal", "mz_console_cluster_utilization_overview_3h", "VIEW"),
    ("mz_internal", "mz_frontiers", "SOURCE"),
    ("mz_internal", "mz_global_frontiers", "VIEW"),
    ("mz_internal", "mz_history_retention_strategies", "BASE TABLE"),
    ("mz_internal", "mz_hydration_statuses", "VIEW"),
    ("mz_internal", "mz_index_advice", "VIEW"),
    ("mz_internal", "mz_internal_cluster_replicas", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_kafka_source_tables", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_license_keys", "BASE TABLE"),
    ("mz_internal", "mz_materialization_dependencies", "VIEW"),
    ("mz_internal", "mz_materialization_lag", "VIEW"),
    ("mz_internal", "mz_materialized_view_refresh_strategies", "BASE TABLE"),
    ("mz_internal", "mz_materialized_view_refreshes", "SOURCE"),
    ("mz_internal", "mz_mcp_data_product_details", "VIEW"),
    ("mz_internal", "mz_mcp_data_products", "VIEW"),
    ("mz_internal", "mz_mysql_source_tables", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_network_policies", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_network_policy_rules", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_notices", "VIEW"),
    ("mz_internal", "mz_notices_redacted", "VIEW"),
    ("mz_internal", "mz_object_arrangement_size_history", "BASE TABLE"),
    ("mz_internal", "mz_object_arrangement_sizes", "SOURCE"),
    ("mz_internal", "mz_object_dependencies", "BASE TABLE"),
    ("mz_internal", "mz_object_fully_qualified_names", "VIEW"),
    ("mz_internal", "mz_object_global_ids", "BASE TABLE"),
    ("mz_internal", "mz_object_history", "VIEW"),
    ("mz_internal", "mz_object_lifetimes", "VIEW"),
    ("mz_internal", "mz_object_oid_alias", "VIEW"),
    ("mz_internal", "mz_object_transitive_dependencies", "VIEW"),
    ("mz_internal", "mz_objects_id_namespace_types", "VIEW"),
    ("mz_internal", "mz_ontology_entity_types", "VIEW"),
    ("mz_internal", "mz_ontology_link_types", "VIEW"),
    ("mz_internal", "mz_ontology_properties", "VIEW"),
    ("mz_internal", "mz_ontology_semantic_types", "VIEW"),
    ("mz_internal", "mz_optimizer_notices", "BASE TABLE"),
    ("mz_internal", "mz_overridden_system_parameters", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_pending_cluster_replicas", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_postgres_source_tables", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_postgres_sources", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_prepared_statement_history", "SOURCE"),
    ("mz_internal", "mz_recent_activity_log", "VIEW"),
    ("mz_internal", "mz_recent_activity_log_redacted", "VIEW"),
    ("mz_internal", "mz_recent_activity_log_thinned", "VIEW"),
    ("mz_internal", "mz_recent_sql_text", "VIEW"),
    ("mz_internal", "mz_recent_sql_text_redacted", "VIEW"),
    ("mz_internal", "mz_replacements", "BASE TABLE"),
    ("mz_internal", "mz_replica_system_parameters", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_session_history", "SOURCE"),
    ("mz_internal", "mz_sessions", "BASE TABLE"),
    ("mz_internal", "mz_show_all_my_privileges", "VIEW"),
    ("mz_internal", "mz_show_all_objects", "VIEW"),
    ("mz_internal", "mz_show_all_privileges", "VIEW"),
    ("mz_internal", "mz_show_cluster_privileges", "VIEW"),
    ("mz_internal", "mz_show_cluster_replicas", "VIEW"),
    ("mz_internal", "mz_show_clusters", "VIEW"),
    ("mz_internal", "mz_show_columns", "VIEW"),
    ("mz_internal", "mz_show_connections", "VIEW"),
    ("mz_internal", "mz_show_database_privileges", "VIEW"),
    ("mz_internal", "mz_show_databases", "VIEW"),
    ("mz_internal", "mz_show_default_privileges", "VIEW"),
    ("mz_internal", "mz_show_indexes", "VIEW"),
    ("mz_internal", "mz_show_materialized_views", "VIEW"),
    ("mz_internal", "mz_show_my_cluster_privileges", "VIEW"),
    ("mz_internal", "mz_show_my_database_privileges", "VIEW"),
    ("mz_internal", "mz_show_my_default_privileges", "VIEW"),
    ("mz_internal", "mz_show_my_object_privileges", "VIEW"),
    ("mz_internal", "mz_show_my_role_members", "VIEW"),
    ("mz_internal", "mz_show_my_schema_privileges", "VIEW"),
    ("mz_internal", "mz_show_my_system_privileges", "VIEW"),
    ("mz_internal", "mz_show_network_policies", "VIEW"),
    ("mz_internal", "mz_show_object_privileges", "VIEW"),
    ("mz_internal", "mz_show_role_members", "VIEW"),
    ("mz_internal", "mz_show_roles", "VIEW"),
    ("mz_internal", "mz_show_schema_privileges", "VIEW"),
    ("mz_internal", "mz_show_schemas", "VIEW"),
    ("mz_internal", "mz_show_secrets", "VIEW"),
    ("mz_internal", "mz_show_sinks", "VIEW"),
    ("mz_internal", "mz_show_sources", "VIEW"),
    ("mz_internal", "mz_show_system_privileges", "VIEW"),
    ("mz_internal", "mz_show_tables", "VIEW"),
    ("mz_internal", "mz_show_types", "VIEW"),
    ("mz_internal", "mz_show_views", "VIEW"),
    ("mz_internal", "mz_sink_statistics", "VIEW"),
    ("mz_internal", "mz_sink_statistics_raw", "SOURCE"),
    ("mz_internal", "mz_sink_status_history", "SOURCE"),
    ("mz_internal", "mz_sink_statuses", "VIEW"),
    ("mz_internal", "mz_source_references", "BASE TABLE"),
    ("mz_internal", "mz_source_statistics", "VIEW"),
    ("mz_internal", "mz_source_statistics_raw", "SOURCE"),
    ("mz_internal", "mz_source_statistics_with_history", "VIEW"),
    ("mz_internal", "mz_source_status_history", "SOURCE"),
    ("mz_internal", "mz_source_statuses", "VIEW"),
    ("mz_internal", "mz_sql_server_source_tables", "MATERIALIZED VIEW"),
    ("mz_internal", "mz_sql_text", "SOURCE"),
    ("mz_internal", "mz_sql_text_redacted", "VIEW"),
    ("mz_internal", "mz_statement_execution_history", "SOURCE"),
    ("mz_internal", "mz_statement_execution_history_redacted", "VIEW"),
    ("mz_internal", "mz_statement_lifecycle_history", "SOURCE"),
    ("mz_internal", "mz_storage_shards", "SOURCE"),
    ("mz_internal", "mz_storage_usage_by_shard", "BASE TABLE"),
    ("mz_internal", "mz_subscriptions", "BASE TABLE"),
    ("mz_internal", "mz_type_pg_metadata", "BASE TABLE"),
    ("mz_internal", "mz_wallclock_global_lag", "VIEW"),
    ("mz_internal", "mz_wallclock_global_lag_histogram", "VIEW"),
    ("mz_internal", "mz_wallclock_global_lag_histogram_raw", "SOURCE"),
    ("mz_internal", "mz_wallclock_global_lag_history", "VIEW"),
    ("mz_internal", "mz_wallclock_global_lag_recent_history", "VIEW"),
    ("mz_internal", "mz_wallclock_lag_history", "SOURCE"),
    ("mz_internal", "mz_webhook_sources", "BASE TABLE"),
    ("mz_internal", "pg_attrdef_all_databases", "VIEW"),
    ("mz_internal", "pg_attribute_all_databases", "VIEW"),
    ("mz_internal", "pg_authid_core", "VIEW"),
    ("mz_internal", "pg_class_all_databases", "VIEW"),
    ("mz_internal", "pg_description_all_databases", "VIEW"),
    ("mz_internal", "pg_namespace_all_databases", "VIEW"),
    ("mz_internal", "pg_type_all_databases", "VIEW"),
    ("mz_introspection", "mz_active_peeks", "VIEW"),
    ("mz_introspection", "mz_active_peeks_per_worker", "SOURCE"),
    ("mz_introspection", "mz_arrangement_batcher_allocations_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_batcher_capacity_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_batcher_records_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_batcher_size_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_batches_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_heap_allocations_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_heap_capacity_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_heap_size_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_records_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_sharing", "VIEW"),
    ("mz_introspection", "mz_arrangement_sharing_per_worker", "VIEW"),
    ("mz_introspection", "mz_arrangement_sharing_raw", "SOURCE"),
    ("mz_introspection", "mz_arrangement_sizes", "VIEW"),
    ("mz_introspection", "mz_arrangement_sizes_per_worker", "VIEW"),
    ("mz_introspection", "mz_cluster_prometheus_metrics", "SOURCE"),
    ("mz_introspection", "mz_compute_dataflow_global_ids_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_error_counts", "VIEW"),
    ("mz_introspection", "mz_compute_error_counts_per_worker", "VIEW"),
    ("mz_introspection", "mz_compute_error_counts_raw", "SOURCE"),
    ("mz_introspection", "mz_compute_exports", "VIEW"),
    ("mz_introspection", "mz_compute_exports_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_frontiers", "VIEW"),
    ("mz_introspection", "mz_compute_frontiers_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_hydration_times_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_import_frontiers", "VIEW"),
    ("mz_introspection", "mz_compute_import_frontiers_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_lir_mapping_per_worker", "SOURCE"),
    ("mz_introspection", "mz_compute_operator_durations_histogram", "VIEW"),
    ("mz_introspection", "mz_compute_operator_durations_histogram_per_worker", "VIEW"),
    ("mz_introspection", "mz_compute_operator_durations_histogram_raw", "SOURCE"),
    ("mz_introspection", "mz_compute_operator_hydration_statuses_per_worker", "SOURCE"),
    ("mz_introspection", "mz_dataflow_addresses", "VIEW"),
    ("mz_introspection", "mz_dataflow_addresses_per_worker", "SOURCE"),
    ("mz_introspection", "mz_dataflow_arrangement_sizes", "VIEW"),
    ("mz_introspection", "mz_dataflow_channel_operators", "VIEW"),
    ("mz_introspection", "mz_dataflow_channel_operators_per_worker", "VIEW"),
    ("mz_introspection", "mz_dataflow_channels", "VIEW"),
    ("mz_introspection", "mz_dataflow_channels_per_worker", "SOURCE"),
    ("mz_introspection", "mz_dataflow_global_ids", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_dataflows", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_dataflows_per_worker", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_parents", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_parents_per_worker", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_reachability", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_reachability_per_worker", "VIEW"),
    ("mz_introspection", "mz_dataflow_operator_reachability_raw", "SOURCE"),
    ("mz_introspection", "mz_dataflow_operators", "VIEW"),
    ("mz_introspection", "mz_dataflow_operators_per_worker", "SOURCE"),
    ("mz_introspection", "mz_dataflows", "VIEW"),
    ("mz_introspection", "mz_dataflows_per_worker", "VIEW"),
    ("mz_introspection", "mz_expected_group_size_advice", "VIEW"),
    ("mz_introspection", "mz_lir_mapping", "VIEW"),
    ("mz_introspection", "mz_mappable_objects", "VIEW"),
    ("mz_introspection", "mz_message_batch_counts_received_raw", "SOURCE"),
    ("mz_introspection", "mz_message_batch_counts_sent_raw", "SOURCE"),
    ("mz_introspection", "mz_message_counts", "VIEW"),
    ("mz_introspection", "mz_message_counts_per_worker", "VIEW"),
    ("mz_introspection", "mz_message_counts_received_raw", "SOURCE"),
    ("mz_introspection", "mz_message_counts_sent_raw", "SOURCE"),
    ("mz_introspection", "mz_peek_durations_histogram", "VIEW"),
    ("mz_introspection", "mz_peek_durations_histogram_per_worker", "VIEW"),
    ("mz_introspection", "mz_peek_durations_histogram_raw", "SOURCE"),
    ("mz_introspection", "mz_records_per_dataflow", "VIEW"),
    ("mz_introspection", "mz_records_per_dataflow_operator", "VIEW"),
    ("mz_introspection", "mz_records_per_dataflow_operator_per_worker", "VIEW"),
    ("mz_introspection", "mz_records_per_dataflow_per_worker", "VIEW"),
    ("mz_introspection", "mz_scheduling_elapsed", "VIEW"),
    ("mz_introspection", "mz_scheduling_elapsed_per_worker", "VIEW"),
    ("mz_introspection", "mz_scheduling_elapsed_raw", "SOURCE"),
    ("mz_introspection", "mz_scheduling_parks_histogram", "VIEW"),
    ("mz_introspection", "mz_scheduling_parks_histogram_per_worker", "VIEW"),
    ("mz_introspection", "mz_scheduling_parks_histogram_raw", "SOURCE"),
    ("pg_catalog", "pg_aggregate", "VIEW"),
    ("pg_catalog", "pg_am", "VIEW"),
    ("pg_catalog", "pg_attrdef", "VIEW"),
    ("pg_catalog", "pg_attribute", "VIEW"),
    ("pg_catalog", "pg_auth_members", "VIEW"),
    ("pg_catalog", "pg_authid", "VIEW"),
    ("pg_catalog", "pg_class", "VIEW"),
    ("pg_catalog", "pg_collation", "VIEW"),
    ("pg_catalog", "pg_constraint", "VIEW"),
    ("pg_catalog", "pg_database", "VIEW"),
    ("pg_catalog", "pg_depend", "VIEW"),
    ("pg_catalog", "pg_description", "VIEW"),
    ("pg_catalog", "pg_enum", "VIEW"),
    ("pg_catalog", "pg_event_trigger", "VIEW"),
    ("pg_catalog", "pg_extension", "VIEW"),
    ("pg_catalog", "pg_index", "VIEW"),
    ("pg_catalog", "pg_indexes", "VIEW"),
    ("pg_catalog", "pg_inherits", "VIEW"),
    ("pg_catalog", "pg_language", "VIEW"),
    ("pg_catalog", "pg_locks", "VIEW"),
    ("pg_catalog", "pg_matviews", "VIEW"),
    ("pg_catalog", "pg_namespace", "VIEW"),
    ("pg_catalog", "pg_operator", "VIEW"),
    ("pg_catalog", "pg_policy", "VIEW"),
    ("pg_catalog", "pg_proc", "VIEW"),
    ("pg_catalog", "pg_range", "VIEW"),
    ("pg_catalog", "pg_rewrite", "VIEW"),
    ("pg_catalog", "pg_roles", "VIEW"),
    ("pg_catalog", "pg_settings", "VIEW"),
    ("pg_catalog", "pg_shdescription", "VIEW"),
    ("pg_catalog", "pg_tables", "VIEW"),
    ("pg_catalog", "pg_tablespace", "VIEW"),
    ("pg_catalog", "pg_timezone_abbrevs", "VIEW"),
    ("pg_catalog", "pg_timezone_names", "VIEW"),
    ("pg_catalog", "pg_trigger", "VIEW"),
    ("pg_catalog", "pg_type", "VIEW"),
    ("pg_catalog", "pg_user", "VIEW"),
    ("pg_catalog", "pg_views", "VIEW"))

  private val tablesSchema = StructType(Seq(
    StructField("table_catalog", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("table_type", StringType, nullable = false)))

  /** The session's user relations as information_schema rows. `rels` is the
    * same one-per-register() catalog snapshot the pg_catalog builders use. */
  def tables(spark: SparkSession, rels: Seq[(String, String, StructType)],
      sltMvs: Set[String] = Set.empty): DataFrame = {
    val mvs = GraftSqlCatalog.forSession(spark).viewNames
      .map(GraftSqlCatalog.normId).toSet ++ sltMvs.map(GraftSqlCatalog.normId)
    val sources = GraftSqlCatalog.sourcesFor(spark).keys
      .map(GraftSqlCatalog.normId).toSet
    val userRows = rels.filter(_._2 != "i").map { case (name, kind, _) =>
      val n = GraftSqlCatalog.normId(name)
      val ty =
        if (mvs.contains(n)) "MATERIALIZED VIEW"
        else if (sources.contains(n)) "SOURCE"
        else if (kind == "r") "BASE TABLE"
        else "VIEW"
      Row("materialize", "public", name, ty)
    }
    // sources registered without a backing temp view still list
    val seen = rels.map(r => GraftSqlCatalog.normId(r._1)).toSet
    val srcRows = sources.filterNot(seen.contains).toSeq.sorted
      .map(s => Row("materialize", "public", s, "SOURCE"))
    val all = builtinRows.map { case (sch, n, ty) =>
      Row("materialize", sch, n, ty)
    } ++ userRows ++ srcRows
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(all).asJava), tablesSchema)
  }

  private val columnsSchema = StructType(Seq(
    StructField("table_catalog", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal_position", LongType, nullable = false),
    StructField("column_default", StringType, nullable = true),
    StructField("is_nullable", StringType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("character_maximum_length", LongType, nullable = true),
    StructField("numeric_precision", LongType, nullable = true),
    StructField("numeric_scale", LongType, nullable = true)))

  /** pg's information_schema type names for the engine's Spark types (the
    * reference reports pg names: integer / bigint / text / ...). The three
    * trailing metrics render NULL — matching the reference's rows for the
    * plain types the corpus exercises. */
  private[sql] def pgTypeNameOf(dt: DataType): String = pgTypeName(dt)

  private def pgTypeName(dt: DataType): String = dt match {
    case IntegerType => "integer"
    case LongType => "bigint"
    case ShortType => "smallint"
    case DoubleType => "double precision"
    case FloatType => "real"
    case StringType => "text"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp without time zone"
    case BinaryType => "bytea"
    case _: DecimalType => "numeric"
    case ArrayType(el, _) => pgTypeName(el) + "[]"
    case _ => "text"
  }

  /** DEFAULT expression text per column, parsed from the recorded CREATE
    * TABLE statement (`c2 int DEFAULT 1 + 2` reports `1 + 2`). */
  private[sql] def defaultsOf(createSql: String): Map[String, String] = {
    val open = createSql.indexOf('(')
    if (open < 0) return Map.empty
    // split the column list at top-level commas
    var depth = 0
    val parts = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var i = open + 1
    var done = false
    while (i < createSql.length && !done) {
      val c = createSql.charAt(i)
      if (c == '(') { depth += 1; cur.append(c) }
      else if (c == ')') {
        if (depth == 0) { parts += cur.toString; done = true }
        else { depth -= 1; cur.append(c) }
      }
      else if (c == ',' && depth == 0) { parts += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    parts.flatMap { p =>
      val m = """(?is)^\s*["`]?(\w+)["`]?\s+.*?\bDEFAULT\s+(.+?)\s*$""".r
        .findFirstMatchIn(p)
      m.map(mm => GraftSqlCatalog.normId(mm.group(1)) -> mm.group(2).trim)
    }.toMap
  }

  def columns(spark: SparkSession,
      rels: Seq[(String, String, StructType)]): DataFrame = {
    val tableSql = GraftSqlCatalog.tableSqlFor(spark)
    val rows = rels.filter(_._2 != "i").flatMap { case (name, _, schema) =>
      val defaults = tableSql.get(GraftSqlCatalog.normId(name))
        .map(defaultsOf).getOrElse(Map.empty)
      schema.fields.toIndexedSeq.zipWithIndex.map { case (f, idx) =>
        Row("materialize", "public", name, f.name, (idx + 1).toLong,
          defaults.get(GraftSqlCatalog.normId(f.name)).orNull,
          if (f.nullable) "YES" else "NO", pgTypeName(f.dataType),
          null, null, null)
      }
    }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), columnsSchema)
  }
}
