package graft.slt

import org.apache.spark.sql.SparkSession

/** Narrow test access to SltRunner's private shim/mutation machinery. */
object SltTestHooks {
  def shimFor(sql: String, crdb: Boolean): String = SltRunner.testShim(sql, crdb)
  def mutate(spark: SparkSession, sql: String): Boolean =
    SltRunner.testApplyMutation(spark, sql)
  def rewriteArrays(sql: String): String = SltRunner.rewriteArrayLiterals(sql)
}
