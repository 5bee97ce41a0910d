package graft.slt

/** Scratch debug (env-gated, not part of the suite). */
class ScratchDebugSpec extends graft.SparkSpec {
  test("debug census objects view") {
    assume(sys.env.contains("SLT_DEBUG"), "SLT_DEBUG not set")
    graft.sql.PgCatalogRelations.register(spark, Nil)
    val viewSql = """SELECT
      schema.name AS schema, objects.name AS object, columns.position,
      columns.name, columns.type, comments.comment
      FROM mz_columns AS columns
      JOIN mz_objects AS objects ON columns.id = objects.id
      JOIN mz_schemas AS schema ON objects.schema_id = schema.id
      LEFT JOIN mz_comments AS comments
        ON columns.id = comments.id AND columns.position = comments.object_sub_id"""
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW objects AS $viewSql")
    val rows = spark.sql(
      "SELECT name, type, comment FROM objects WHERE schema = 'mz_catalog' AND object = 'mz_array_types' ORDER BY position").collect()
    rows.foreach(r => info(s"row: ${r.toSeq.mkString("|")}"))
    assert(rows.length == 2)
  }
}
