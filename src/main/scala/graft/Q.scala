package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the operator is
  * SQL-expressible) a DuckDB oracle over the same parquet tables. Keeping the
  * pair in one value guarantees the name stays aligned between
  * `SparkEntry.queries` and `SparkEntry.oracleSql`.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Non-SQL-expressible operator → driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
